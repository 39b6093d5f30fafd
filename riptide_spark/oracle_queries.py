"""Dialect-parallel SQL generators: each query is written once against a tiny
dialect abstraction and rendered twice — Spark SQL (the engine under test)
and DuckDB ANSI SQL (the driver's oracle). Keeping both renderings of a
query textually parallel eliminates an entire class of oracle-mismatch bugs.

Queries over the synthesized ``pages`` CTE re-express the reference's gate /
validation / scoring operators (SURVEY.md §2.2) relationally; the rest cover
the engine's aggregation/join/window/dedup surface over the TPC-H-ish
testdata tables.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str
    str_t: str          # cast-to-string type name
    gflag: str          # trailing regexp_replace "global" flag argument
    arr_len: str        # array length function
    arr_min: str        # array min function
    esc_backslash: bool # double the backslashes inside string literals

    def re(self, pattern: str) -> str:
        """Render a regex as a quoted SQL string literal."""
        if self.esc_backslash:
            pattern = pattern.replace("\\", "\\\\")
        return "'" + pattern.replace("'", "''") + "'"

    def s(self, expr: str) -> str:
        return f"CAST({expr} AS {self.str_t})"

    def rre(self, expr: str, pattern: str, replacement: str = "") -> str:
        return f"regexp_replace({expr}, {self.re(pattern)}, '{replacement}'{self.gflag})"

    def rx_all_count(self, expr: str, pattern: str) -> str:
        if self.name == "spark":
            return f"CAST(size(regexp_extract_all({expr}, {self.re(pattern)}, 0)) AS BIGINT)"
        return f"CAST(len(regexp_extract_all({expr}, {self.re(pattern)})) AS BIGINT)"

    def rx_first(self, expr: str, pattern: str) -> str:
        # try_element_at / list_extract both yield NULL when no match exists.
        if self.name == "spark":
            return f"try_element_at(regexp_extract_all({expr}, {self.re(pattern)}, 0), 1)"
        return f"list_extract(regexp_extract_all({expr}, {self.re(pattern)}), 1)"

    def split_ws(self, expr: str) -> str:
        if self.name == "spark":
            return f"split(trim({expr}), {self.re(chr(92) + 's+')})"
        return f"regexp_split_to_array(trim({expr}), {self.re(chr(92) + 's+')})"

    def hash60(self, expr: str) -> str:
        """First 15 hex chars of md5 as BIGINT — portable 60-bit hash."""
        if self.name == "spark":
            return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
        return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"

    def slice_k(self, arr: str, start: str, k: int) -> str:
        if self.name == "spark":
            return f"slice({arr}, {start}, {k})"
        return f"{arr}[{start}:{start}+{k - 1}]"

    def arr_join(self, arr: str, sep: str = " ") -> str:
        if self.name == "spark":
            return f"array_join({arr}, '{sep}')"
        return f"array_to_string({arr}, '{sep}')"

    def seconds(self, ts: str) -> str:
        if self.name == "spark":
            return f"unix_timestamp({ts})"
        return f"date_diff('second', TIMESTAMP '1970-01-01 00:00:00', {ts})"

    def sum_list(self, arr: str) -> str:
        if self.name == "spark":
            return f"aggregate({arr}, 0L, (acc, v) -> acc + v)"
        return f"COALESCE(CAST(list_sum({arr}) AS BIGINT), 0)"


SPARK = Dialect("spark", "STRING", "", "size", "array_min", True)
DUCK = Dialect("duck", "VARCHAR", ", 'g'", "len", "list_min", False)

_WS = "\\s+"

# ---------------------------------------------------------------------------
# Synthesized pages CTE — deterministic HTML/URL built from `documents`,
# identical text in both dialects (ASCII markup, so chars == bytes).
# ---------------------------------------------------------------------------


def pages_cte(d: Dialect) -> str:
    did = d.s("doc_id")
    return f"""
WITH pages AS (
  SELECT
    doc_id, lang, source, text,
    'https://' || (CASE WHEN doc_id % 11 = 0 THEN 'en.wikipedia.org'
                        WHEN doc_id % 7 = 0 THEN 'medium.com'
                        ELSE source || '.example.com' END)
      || '/doc/' || {did} AS url,
    '<html lang="' || lang || '"><head><title>Doc ' || {did} || '</title>'
      || (CASE WHEN doc_id % 3 = 0 THEN '<meta property="og:title" content="Doc">' ELSE '' END)
      || '</head><body>'
      || repeat('<script>var x=1;</script>', CAST(doc_id % 4 AS INT))
      || (CASE WHEN doc_id % 5 = 0 THEN '<article><h1>Doc ' || {did} || '</h1>' ELSE '<div>' END)
      || '<p>' || text || '</p>'
      || (CASE WHEN doc_id % 5 = 0 THEN '</article>' ELSE '</div>' END)
      || '</body></html>' AS html
  FROM documents
)"""


def _count_sub(d: Dialect, expr: str, needle: str) -> str:
    n = len(needle)
    return f"CAST((length({expr}) - length(replace({expr}, '{needle}', ''))) / {n} AS BIGINT)"


def _gate_features_select(d: Dialect) -> str:
    script_parts = "slice(split(html, '<script'), 2, greatest(size(split(html, '<script')) - 1, 0))" \
        if d.name == "spark" else "string_split(html, '<script')[2:]"
    if d.name == "spark":
        script_bytes = (
            f"aggregate({script_parts}, 0L, (acc, p) -> acc + "
            "CASE WHEN instr(p, '</script>') > 0 THEN CAST(instr(p, '</script>') + 8 AS LONG) "
            "ELSE CAST(length(p) AS LONG) END)"
        )
    else:
        script_bytes = (
            f"COALESCE(CAST(list_sum(list_transform({script_parts}, p -> "
            "CASE WHEN instr(p, '</script>') > 0 THEN instr(p, '</script>') + 8 "
            "ELSE length(p) END)) AS BIGINT), 0)"
        )
    visible = d.rre("html", "[\\x00-\\x1F\\x7F-\\x9F]")
    return f"""
  SELECT
    doc_id,
    CAST(length(html) AS BIGINT) AS html_len,
    CAST(length({visible}) AS BIGINT) AS visible_chars,
    {_count_sub(d, 'html', '<p')} AS p_count,
    {_count_sub(d, 'html', '<article')} + {_count_sub(d, 'html', '<main')} AS article_count,
    {_count_sub(d, 'html', '<h1')} + {_count_sub(d, 'html', '<h2')} AS h1h2_count,
    {script_bytes} AS script_bytes,
    CAST(CASE WHEN instr(html, 'property="og:') > 0 OR instr(html, 'property=''og:') > 0
         THEN 1 ELSE 0 END AS INT) AS has_og,
    CAST(CASE WHEN instr(html, '"@type":"Article"') > 0 THEN 1 ELSE 0 END AS INT) AS has_jsonld,
    CAST((CASE WHEN instr(html, '__NEXT_DATA__') > 0 THEN 1 ELSE 0 END)
       + (CASE WHEN instr(html, 'data-reactroot') > 0 OR instr(html, 'data-react-helmet') > 0 THEN 1 ELSE 0 END)
       + (CASE WHEN instr(html, 'id="root"') > 0 AND {_count_sub(d, 'html', '<div')} > 20 THEN 1 ELSE 0 END)
       + (CASE WHEN {script_bytes} > CAST(length(html) / 2 AS BIGINT) THEN 1 ELSE 0 END) AS INT) AS spa_markers,
    CAST(CASE WHEN url LIKE '%wikipedia.%' OR url LIKE '%github.%' THEN 0.9
              WHEN url LIKE '%medium.%' OR url LIKE '%dev.to%' THEN 0.8
              ELSE 0.5 END AS DOUBLE) AS domain_prior
  FROM pages"""


def q_gate_features(d: Dialect) -> str:
    """Gate feature extraction (pipeline.rs:769-841) as relational ops.

    Spark's strpos == instr (both 1-based); DuckDB strpos identical."""
    return pages_cte(d) + _gate_features_select(d)


_SCORE_EXPR = """
    ROUND(GREATEST(0.0, LEAST(1.0,
        GREATEST(0.0, LEAST(0.6, (visible_chars * 1.2) / html_len))
      + GREATEST(0.0, LEAST(0.3, ln(p_count + 1.0) * 0.06))
      + (CASE WHEN article_count > 0 THEN 0.15 ELSE 0.0 END)
      + (CASE WHEN has_og = 1 THEN 0.08 ELSE 0.0 END)
      + (CASE WHEN has_jsonld = 1 THEN 0.12 ELSE 0.0 END)
      - GREATEST(0.0, LEAST(0.4, (script_bytes * 0.8) / html_len))
      - (CASE WHEN spa_markers >= 2 THEN 0.25 ELSE 0.0 END)
      + (domain_prior - 0.5) * 0.1
    )), 6) AS gate_score"""


def q_gate_score(d: Dialect) -> str:
    """Gate score (gate.rs:83-137): clamped weighted sum, rounded 6dp."""
    return (
        pages_cte(d)
        + ", feats AS ("
        + _gate_features_select(d)
        + f")\n  SELECT doc_id, CAST({_SCORE_EXPR.strip().removesuffix('AS gate_score')} AS DOUBLE) AS gate_score FROM feats"
    )


def q_route_counts(d: Dialect) -> str:
    """Routing decision (gate.rs:233-246) + per-decision counts (A1)."""
    return (
        pages_cte(d)
        + ", feats AS ("
        + _gate_features_select(d)
        + f"), scored AS (SELECT doc_id, spa_markers, {_SCORE_EXPR} FROM feats)\n"
        + """
  SELECT content_mode, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM (
    SELECT CASE WHEN gate_score >= 0.7 THEN 'raw'
                WHEN gate_score <= 0.3 OR spa_markers >= 3 THEN 'headless'
                ELSE 'probes_first' END AS content_mode
    FROM scored
  ) t
  GROUP BY content_mode"""
    )


def q_validation_flags(d: Dialect) -> str:
    """P1-P3 validation predicates (common_validation.rs:52-89) as filters."""
    lower = "lower(html)"
    return pages_cte(d) + f"""
  SELECT
    CAST(CASE WHEN instr({lower}, '<html') > 0 OR instr({lower}, '<!doctype') > 0
         THEN 1 ELSE 0 END AS INT) AS has_html_tags,
    CAST(CASE WHEN instr({lower}, '<body') > 0 THEN 1 ELSE 0 END AS INT) AS has_body,
    CAST(CASE WHEN instr({lower}, '<p>') > 0 OR instr({lower}, '<div') > 0
          OR instr({lower}, '<article') > 0 OR instr({lower}, '<main') > 0
         THEN 1 ELSE 0 END AS INT) AS has_content_tags,
    CAST(CASE WHEN length(html) <= 20971520 THEN 1 ELSE 0 END AS INT) AS size_ok,
    CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pages
  GROUP BY 1, 2, 3, 4"""


def q_word_count_reading_time(d: Dialect) -> str:
    """E13: whitespace word count + ceil(words/225) reading time, min 1."""
    words = f"CAST({d.arr_len}({d.split_ws('text')}) AS BIGINT)"
    return f"""
  SELECT doc_id,
    {words} AS word_count,
    CAST(GREATEST(CAST(ceil({words} / 225.0) AS BIGINT), 1) AS BIGINT) AS reading_time
  FROM documents"""


def q_quality_tiers(d: Dialect) -> str:
    """E14 basic quality score tiers over (title_len, content_len, words)."""
    words = f"CAST({d.arr_len}({d.split_ws('text')}) AS BIGINT)"
    title_len = f"length('Doc ' || {d.s('doc_id')})"
    return f"""
  SELECT doc_id, CAST(LEAST(100,
      30
    + (CASE WHEN {title_len} > 10 AND {title_len} < 100 THEN 15
            WHEN {title_len} > 5 THEN 8 ELSE 0 END)
    + (CASE WHEN length(text) > 2000 THEN 20
            WHEN length(text) > 1000 THEN 15
            WHEN length(text) > 500 THEN 10
            WHEN length(text) > 200 THEN 5 ELSE 0 END)
    + (CASE WHEN doc_id % 2 = 0 THEN 10 ELSE 0 END)
    + (CASE WHEN doc_id % 3 = 0 THEN 10 ELSE 0 END)
    + (CASE WHEN {words} > 500 THEN 10 WHEN {words} > 200 THEN 5 ELSE 0 END)
  ) AS INT) AS quality_score
  FROM documents"""


def q_regex_extraction(d: Dialect) -> str:
    """E21 regex extraction over deterministic contact-enriched text."""
    body = (
        f"'reach user' || {d.s('doc_id')} || '@mail.example.com or call (555) 010-'"
        f" || substr({d.s('doc_id % 10000 + 10000')}, 2, 4)"
        f" || ' on 2024-0' || {d.s('doc_id % 9 + 1')} || '-15 price $'"
        f" || {d.s('doc_id % 90 + 10')} || '.50 see https://ref.example.com/x' || {d.s('doc_id')}"
        " || ' ' || text"
    )
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    url = "https?://[^\\s<>\"]+"
    iso = "\\d{4}-\\d{2}-\\d{2}"
    phone = "\\(\\d{3}\\) \\d{3}-\\d{4}"
    price = "\\$\\d+\\.\\d{2}"
    return f"""
  WITH enriched AS (SELECT doc_id, {body} AS body FROM documents)
  SELECT doc_id,
    {d.rx_all_count('body', email)} AS n_emails,
    {d.rx_first('body', email)} AS first_email,
    {d.rx_all_count('body', url)} AS n_urls,
    {d.rx_first('body', url)} AS first_url,
    {d.rx_all_count('body', iso)} AS n_iso_dates,
    {d.rx_all_count('body', phone)} AS n_phones,
    {d.rx_all_count('body', price)} AS n_prices
  FROM enriched"""


_DUP_CORPUS = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0
)"""


def q_dedup_exact(d: Dialect) -> str:
    """Exact dedup: md5 over normalized text, groups with >1 member."""
    fp = f"md5({d.rre('trim(lower(text))', _WS, ' ')})"
    return _DUP_CORPUS + f"""
  SELECT {fp} AS fingerprint,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(doc_id) AS keep_id
  FROM corpus
  GROUP BY 1
  HAVING COUNT(*) > 1"""


def _shingles_expr(d: Dialect, words: str, k: int = 3) -> str:
    """k-word shingle array (guarded for short docs)."""
    n = f"{d.arr_len}({words})"
    if d.name == "spark":
        gen = f"transform(sequence(1, {n} - {k - 1}), i -> array_join(slice({words}, i, {k}), ' '))"
        short = f"array(array_join({words}, ' '))"
    else:
        gen = f"list_transform(generate_series(1, {n} - {k - 1}), i -> array_to_string({words}[i:i+{k - 1}], ' '))"
        short = f"[array_to_string({words}, ' ')]"
    return f"CASE WHEN {n} >= {k} THEN {gen} ELSE {short} END"


MERSENNE31 = 2_147_483_647


def _rehash_params(i: int) -> tuple[int, int]:
    """Mirror of operators.dedup.rehash_params — keep in lockstep."""
    return 2 * i + 3, 7919 * i + 12345


def _base_hash_expr(d: Dialect, sh: str = "sh") -> str:
    """One md5-derived base hash per shingle, mod 2^31−1 (the affine-rehash
    domain; one md5 per shingle instead of one per hash function)."""
    fn = "transform" if d.name == "spark" else "list_transform"
    return f"{fn}({sh}, s -> {d.hash60('s')} % {MERSENNE31})"


def _minhash_cols(d: Dialect, num_hashes: int, hs: str = "hs", prefix: str = "m") -> list[str]:
    """min over (a_i·h + b_i) mod 2^31−1 per hash function (overflow-safe:
    intermediates < 2^36)."""
    fn_min = "array_min" if d.name == "spark" else "list_min"
    fn_t = "transform" if d.name == "spark" else "list_transform"
    cols = []
    for i in range(num_hashes):
        a, b = _rehash_params(i)
        cols.append(
            f"{fn_min}({fn_t}({hs}, h -> ({a} * h + {b}) % {MERSENNE31})) AS {prefix}{i}"
        )
    return cols


def q_minhash_signatures(d: Dialect, num_hashes: int = 8) -> str:
    """MinHash signatures: base md5 hash per shingle + affine rehashes."""
    words = d.split_ws("lower(text)")
    sh = _shingles_expr(d, "w")
    cols = _minhash_cols(d, num_hashes, prefix="minhash_")
    return f"""
  WITH toks AS (SELECT doc_id, {words} AS w FROM documents),
       shingled AS (SELECT doc_id, {sh} AS sh FROM toks),
       hashed AS (SELECT doc_id, {_base_hash_expr(d)} AS hs FROM shingled)
  SELECT doc_id, {', '.join(cols)} FROM hashed"""


def _band_union(d: Dialect, num_hashes: int, band_size: int) -> str:
    bands = []
    for b in range(num_hashes // band_size):
        parts = " || ',' || ".join(
            d.s(f"m{b * band_size + j}") for j in range(band_size)
        )
        bands.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs")
    return "\n  UNION ALL\n  ".join(bands)


def q_minhash_pairs(d: Dialect, num_hashes: int = 8, band_size: int = 2) -> str:
    """LSH band-bucket candidate pairs over the duplicated corpus."""
    words = d.split_ws("lower(text)")
    sh = _shingles_expr(d, "w")
    return _DUP_CORPUS + f""",
  toks AS (SELECT doc_id, {words} AS w FROM corpus),
  shingled AS (SELECT doc_id, {sh} AS sh FROM toks),
  hashed AS (SELECT doc_id, {_base_hash_expr(d)} AS hs FROM shingled),
  sigs AS (SELECT doc_id, {', '.join(_minhash_cols(d, num_hashes))} FROM hashed),
  buckets AS ({_band_union(d, num_hashes, band_size)})
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id"""


def q_dedup_components(d: Dialect) -> str:
    """Connected components over the MinHash-LSH candidate-pair graph:
    per node the minimum reachable id (= canonical doc of its duplicate
    cluster). DuckDB gets a true recursive transitive closure; the Spark
    dialect (Spark's recursive CTEs reject UNION, which cyclic closures
    need to terminate) gets a 4-hop bounded closure — exact here because
    LSH clusters of duplicated docs are near-cliques (diameter ≤ 2). The
    engine's production path is the label-propagation DataFrame loop in
    ``operators/dedup.connected_components``, which this oracle checks."""
    pairs_sql = q_minhash_pairs(d)
    prologue = "WITH RECURSIVE" if d.name == "duck" else "WITH"
    closure = (
        """reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
  )"""
        if d.name == "duck"
        else """hop1 AS (SELECT a AS src, b AS dst FROM edges),
  hop2 AS (SELECT src, dst FROM hop1 UNION
           SELECT h.src, e.b AS dst FROM hop1 h JOIN edges e ON h.dst = e.a),
  hop3 AS (SELECT src, dst FROM hop2 UNION
           SELECT h.src, e.b AS dst FROM hop2 h JOIN edges e ON h.dst = e.a),
  reach AS (SELECT src, dst FROM hop3 UNION
            SELECT h.src, e.b AS dst FROM hop3 h JOIN edges e ON h.dst = e.a)"""
    )
    return f"""{prologue} pairs AS (
    SELECT * FROM ({pairs_sql})
  ),
  edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM pairs
  ),
  {closure}
  SELECT src AS doc_id, least(src, min(dst)) AS component_id
  FROM reach GROUP BY src"""


def q_ngram_jaccard(
    d: Dialect, k: int = 3, threshold: float = 0.8,
    num_hashes: int = 8, band_size: int = 2,
) -> str:
    """Exact n-gram Jaccard verification of MinHash-LSH candidate pairs —
    the standard two-stage cascade (mirrors ``dedup.ngram_jaccard_pairs``).

    Candidates come from the same band/bucket construction as
    ``minhash_candidate_pairs``; each candidate is verified by intersecting
    the two documents' distinct-shingle arrays. This replaces the earlier
    shingle self-join, whose cost was quadratic in the document frequency
    of the hottest shingle — the 100 TB scale-killer flagged in round 1.
    Recall vs the exhaustive join: a pair at Jaccard J is a candidate with
    probability 1-(1-J^{band_size})^{num_hashes//band_size} (≥ 0.983 at
    J = threshold = 0.8 with 4 bands × 2); exact duplicates always
    collide."""
    words = d.split_ws("lower(text)")
    sh = _shingles_expr(d, "w", k)
    if d.name == "spark":
        distinct_sh = "array_distinct(sh)"
        inter = "size(array_intersect(sa.dsh, sb.dsh))"
    else:
        distinct_sh = "list_distinct(sh)"
        inter = "len(list_intersect(sa.dsh, sb.dsh))"
    return _DUP_CORPUS + f""",
  toks AS (SELECT doc_id, {words} AS w FROM corpus),
  raw_sh AS (SELECT doc_id, {sh} AS sh FROM toks),
  shingled AS (SELECT doc_id, {distinct_sh} AS dsh FROM raw_sh),
  hashed AS (SELECT doc_id, {_base_hash_expr(d, 'dsh')} AS hs FROM shingled),
  sigs AS (SELECT doc_id, {', '.join(_minhash_cols(d, num_hashes))} FROM hashed),
  buckets AS ({_band_union(d, num_hashes, band_size)}),
  cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  ),
  scored AS (
    SELECT c.id_a, c.id_b,
           CAST({inter} AS BIGINT) AS shared,
           CAST({d.arr_len}(sa.dsh) AS BIGINT) AS n_a,
           CAST({d.arr_len}(sb.dsh) AS BIGINT) AS n_b
    FROM cand c
    JOIN shingled sa ON sa.doc_id = c.id_a
    JOIN shingled sb ON sb.doc_id = c.id_b
  )
  SELECT id_a, id_b, jaccard
  FROM (
    SELECT id_a, id_b,
           CAST(ROUND(shared * 1.0 / (n_a + n_b - shared), 6) AS DOUBLE) AS jaccard
    FROM scored
  ) j
  WHERE jaccard >= {threshold}"""


def q_dedup_embedding(d: Dialect, threshold: float = 0.95) -> str:
    """Embedding-cosine near-dup pairs (exact O(n²) baseline shape; the
    operators/dedup.py LSH-blocked variant is the scale path)."""
    if d.name == "spark":
        vec = "CAST(embedding AS ARRAY<DOUBLE>)"
        dot = (
            "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        norm_a = "sqrt(aggregate(zip_with(a.v, a.v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
        norm_b = "sqrt(aggregate(zip_with(b.v, b.v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    else:
        vec = "embedding::DOUBLE[]"
        dot = "list_dot_product(a.v, b.v)"
        norm_a = "sqrt(list_dot_product(a.v, a.v))"
        norm_b = "sqrt(list_dot_product(b.v, b.v))"
    return f"""
  WITH corpus AS (
    SELECT vec_id, {vec} AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, {vec} AS v FROM embeddings WHERE vec_id % 25 = 0
  )
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(ROUND({dot} / ({norm_a} * {norm_b}), 6) AS DOUBLE) AS cosine_sim
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
  WHERE {dot} / ({norm_a} * {norm_b}) >= {threshold}"""


def _simhash_ctes(d: Dialect, bits: int, source: str) -> str:
    """toks/hashed/fp CTE bodies computing the sign-vote SimHash over the
    given source relation's (doc_id, text)."""
    words = d.split_ws("lower(text)")
    hashes = (
        f"transform(w, x -> {d.hash60('x')})"
        if d.name == "spark"
        else f"list_transform(w, x -> {d.hash60('x')})"
    )
    bit_terms = []
    for b in range(bits):
        if d.name == "spark":
            votes = (
                f"aggregate(h, 0L, (acc, v) -> acc + "
                f"CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
            )
        else:
            votes = (
                f"COALESCE(CAST(list_sum(list_transform(h, v -> "
                f"CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) AS BIGINT), 0)"
            )
        bit_terms.append(f"(CASE WHEN {votes} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)")
    return f"""
  toks AS (SELECT doc_id, {words} AS w FROM {source}),
  hashed AS (SELECT doc_id, {hashes} AS h FROM toks),
  fp AS (SELECT doc_id, CAST({' + '.join(bit_terms)} AS BIGINT) AS simhash FROM hashed)"""


def q_simhash(d: Dialect, bits: int = 16) -> str:
    """16-bit sign-vote SimHash fingerprints."""
    return f"""
  WITH {_simhash_ctes(d, bits, 'documents').strip()}
  SELECT doc_id, simhash FROM fp"""


def q_simhash_pairs(
    d: Dialect, bits: int = 32, max_hamming: int = 3, bands: int = 4
) -> str:
    """SimHash near-dup pairs: pigeonhole band blocking (any pair within
    Hamming ≤ bands-1 shares one intact bit-slice) + exact bit_count(xor)
    verification — the SQL rendering of ``dedup.simhash_near_pairs`` over
    the duplicated corpus."""
    width = bits // bands
    mask = (1 << width) - 1
    band_rows = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band, (simhash >> {b * width}) & {mask} AS bucket FROM fp"
        for b in range(bands)
    )
    ham = (
        f"bit_count(xor(a.simhash, b.simhash))"
        if d.name == "duck"
        else "bit_count(a.simhash ^ b.simhash)"
    )
    return _DUP_CORPUS + "," + _simhash_ctes(d, bits, "corpus") + f""",
  bands AS (
{band_rows}
  ),
  cand AS (
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
  )
  SELECT c.id_a, c.id_b, CAST({ham} AS INT) AS hamming
  FROM cand c
  JOIN fp a ON a.doc_id = c.id_a
  JOIN fp b ON b.doc_id = c.id_b
  WHERE {ham} <= {max_hamming}"""


def q_token_counts(d: Dialect) -> str:
    """Whitespace tokens + BPE-ish regex tokens (letters/digits/symbols)."""
    ws = f"CAST({d.arr_len}({d.split_ws('text')}) AS BIGINT)"
    bpe = d.rx_all_count("lower(text)", "[a-z]+|[0-9]+|[^a-z0-9\\s]")
    return f"""
  SELECT doc_id, {ws} AS ws_tokens, {bpe} AS bpe_tokens FROM documents"""


def _lang_profiles() -> dict[str, str]:
    from .functions.langid import STOPWORD_PROFILES

    return {lang: "|".join(words) for lang, words in STOPWORD_PROFILES.items()}


def q_langid(d: Dialect) -> str:
    """Stopword-profile language ID with deterministic argmax tie-break."""
    profiles = _lang_profiles()
    langs = ("en", "de", "fr", "es", "nl")
    hit_cols = []
    for lang in langs:
        pat = f"\\b({profiles[lang]})\\b"
        hit_cols.append(f"{d.rx_all_count('lower(text)', pat)} AS hits_{lang}")
    best = "GREATEST(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
  WITH hits AS (SELECT doc_id, lang, {', '.join(hit_cols)} FROM documents)
  SELECT doc_id, lang AS actual_lang,
         hits_en, hits_de, hits_fr, hits_es, hits_nl,
         CASE WHEN {best} > 0 THEN {pred} ELSE 'und' END AS predicted_lang
  FROM hits"""


def q_text_quality(d: Dialect) -> str:
    """Quality signals: punct / alpha / stopword ratios, mean word length."""
    words = f"CAST({d.arr_len}({d.split_ws('text')}) AS BIGINT)"
    punct = f"CAST(length({d.rre('text', '[^.,;:!?]')}) AS BIGINT)"
    alpha = f"CAST(length({d.rre('text', '[^A-Za-z]')}) AS BIGINT)"
    profiles = _lang_profiles()
    stop_en = d.rx_all_count("lower(text)", f"\\b({profiles['en']})\\b")
    return f"""
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    {words} AS n_words,
    CAST(ROUND({punct} * 1.0 / GREATEST(length(text), 1), 6) AS DOUBLE) AS punct_ratio,
    CAST(ROUND({alpha} * 1.0 / GREATEST(length(text), 1), 6) AS DOUBLE) AS alpha_ratio,
    CAST(ROUND({stop_en} * 1.0 / GREATEST({words}, 1), 6) AS DOUBLE) AS stopword_ratio,
    CAST(ROUND({alpha} * 1.0 / GREATEST({words}, 1), 6) AS DOUBLE) AS mean_word_len
  FROM documents"""


def quality_keep_expr(d: Dialect, text: str = "text") -> str:
    """The Gopher-rule conjunction as one boolean SQL expression — shared
    by the standalone quality query and the composed curation pipeline
    (the Spark side evaluates the same rendering via ``F.expr``)."""
    words = f"CAST({d.arr_len}({d.split_ws(text)}) AS BIGINT)"
    alpha = f"CAST(length({d.rre(text, '[^A-Za-z]')}) AS BIGINT)"
    symbols = f"CAST(length({d.rre(text, '[^#<>|]')}) AS BIGINT)"
    profiles = _lang_profiles()
    stop_en = d.rx_all_count(f"lower({text})", f"\\b({profiles['en']})\\b")
    mean_wl = f"{alpha} * 1.0 / GREATEST({words}, 1)"
    sym_ratio = f"{symbols} * 1.0 / GREATEST(length({text}), 1)"
    return (
        f"(({words} BETWEEN 50 AND 100000)"
        f" AND ({mean_wl} BETWEEN 3 AND 10)"
        f" AND ({sym_ratio} < 0.1)"
        f" AND ({stop_en} > 0))"
    )


def q_quality_filter(d: Dialect) -> str:
    """Gopher-style composite quality filter verdict per document: word
    count in [50, 100000], mean word length in [3, 10], symbol ratio
    < 0.1, and at least one English stopword (Rae et al. 2021 rule
    family, adapted to the synthetic corpus). The ``keep`` flag is the
    conjunction — what a 100 TB curation pass would partition on."""
    words = f"CAST({d.arr_len}({d.split_ws('text')}) AS BIGINT)"
    alpha = f"CAST(length({d.rre('text', '[^A-Za-z]')}) AS BIGINT)"
    symbols = f"CAST(length({d.rre('text', '[^#<>|]')}) AS BIGINT)"
    profiles = _lang_profiles()
    stop_en = d.rx_all_count("lower(text)", f"\\b({profiles['en']})\\b")
    mean_wl = f"{alpha} * 1.0 / GREATEST({words}, 1)"
    sym_ratio = f"{symbols} * 1.0 / GREATEST(length(text), 1)"
    return f"""
  SELECT doc_id,
    {words} AS n_words,
    CAST({words} BETWEEN 50 AND 100000 AS BOOLEAN) AS ok_word_count,
    CAST({mean_wl} BETWEEN 3 AND 10 AS BOOLEAN) AS ok_mean_word_len,
    CAST({sym_ratio} < 0.1 AS BOOLEAN) AS ok_symbol_ratio,
    CAST({stop_en} > 0 AS BOOLEAN) AS ok_stopwords,
    CAST(({words} BETWEEN 50 AND 100000)
         AND ({mean_wl} BETWEEN 3 AND 10)
         AND ({sym_ratio} < 0.1)
         AND ({stop_en} > 0) AS BOOLEAN) AS keep
  FROM documents"""


def q_stratified_sample(d: Dialect, per_lang: int = 20) -> str:
    """Deterministic stratified sample: top-N docs per language ranked by
    md5(doc_id) — a hash-ordered quota, so every engine/run/retry selects
    the identical sample (no rand()). The curation primitive for building
    balanced training mixes from a skewed corpus."""
    h = f"md5({d.s('doc_id')})"
    return f"""
  WITH ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rk
    FROM documents
  )
  SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank
  FROM ranked WHERE rk <= {per_lang}"""


def q_fingerprints(d: Dialect) -> str:
    """Stable per-document fingerprint (rolling-hash analog, md5-based)."""
    return f"""
  SELECT doc_id, md5({d.rre('trim(lower(text))', _WS, ' ')}) AS fingerprint
  FROM documents"""


def q_topk_per_lang(d: Dialect) -> str:
    """Top-5 longest documents per language (window + rank ≤ k)."""
    return """
  SELECT doc_id, lang, n_chars, CAST(rk AS INT) AS rk FROM (
    SELECT doc_id, lang, n_chars,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rk
    FROM documents
  ) t WHERE rk <= 5"""


def q_resume_anti_join(d: Dialect) -> str:
    """J1 resume semantics: orders with no lineitem (left anti join)."""
    return """
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)"""


def q_dim_broadcast_join(d: Dialect) -> str:
    """J2 broadcast-dim join: customers per region with balance stats."""
    return """
  SELECT r.r_name AS region,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(ROUND(AVG(c.c_acctbal), 4) AS DOUBLE) AS avg_balance
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name"""


def q_events_stats(d: Dialect) -> str:
    """A1 metrics aggregation shape over the events table."""
    return """
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(ROUND(SUM(value), 4) AS DOUBLE) AS total_value,
         CAST(ROUND(AVG(value), 6) AS DOUBLE) AS avg_value
  FROM events
  GROUP BY event_type"""


def q_sessionization(d: Dialect) -> str:
    """Sessionization: lag + gap>30min session starts per user."""
    return f"""
  WITH ordered AS (
    SELECT user_id, {d.seconds('ts')} AS sec,
           LAG({d.seconds('ts')}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
    FROM events
  )
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
  FROM ordered
  GROUP BY user_id"""


def q_cosine_topk(d: Dialect, query_id: int = 0, k: int = 10) -> str:
    """Brute-force cosine top-k against vector ``query_id``."""
    if d.name == "spark":
        dot = (
            "aggregate(zip_with(CAST(e.embedding AS ARRAY<DOUBLE>), q.qv, (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        qv = "CAST(embedding AS ARRAY<DOUBLE>)"
        norm_e = (
            "sqrt(aggregate(zip_with(CAST(e.embedding AS ARRAY<DOUBLE>), CAST(e.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
        )
        norm_q = "sqrt(aggregate(zip_with(q.qv, q.qv, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    else:
        dot = "list_dot_product(e.embedding::DOUBLE[], q.qv)"
        qv = "embedding::DOUBLE[]"
        norm_e = "sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
        norm_q = "sqrt(list_dot_product(q.qv, q.qv))"
    return f"""
  WITH q AS (SELECT {qv} AS qv FROM embeddings WHERE vec_id = {query_id})
  SELECT e.vec_id, CAST(ROUND({dot} / ({norm_e} * {norm_q}), 6) AS DOUBLE) AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != {query_id}
  ORDER BY cosine_sim DESC, e.vec_id ASC
  LIMIT {k}"""


def q_topic_keywords(d: Dialect) -> str:
    """A6: top-5 topic keywords per document (chunking/mod.rs:269-308) as
    explode → groupBy → count → window rank ≤ 5. Ties pinned to
    (count desc, word asc) — the reference's HashMap makes ties random."""
    from .functions.chunking import _STOP_WORDS

    stoplist = ", ".join(f"'{w}'" for w in sorted(_STOP_WORDS))
    if d.name == "spark":
        exploded = f"SELECT doc_id, explode({d.split_ws('text')}) AS word FROM documents"
    else:
        exploded = f"SELECT doc_id, unnest({d.split_ws('text')}) AS word FROM documents"
    cleaned = d.rre("word", "^[^a-zA-Z0-9]+|[^a-zA-Z0-9]+$")
    return f"""
  WITH exploded AS ({exploded}),
  words AS (
    SELECT doc_id, lower({cleaned}) AS w FROM exploded WHERE length(word) > 3
  ),
  filtered AS (SELECT doc_id, w FROM words WHERE w <> '' AND w NOT IN ({stoplist})),
  counts AS (SELECT doc_id, w, COUNT(*) AS n FROM filtered GROUP BY doc_id, w),
  ranked AS (
    SELECT doc_id, w, n,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, w ASC) AS rk
    FROM counts
  )
  SELECT doc_id, w AS keyword, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk
  FROM ranked WHERE rk <= 5"""


def q_engine_selection(d: Dialect) -> str:
    """P9 engine-selection v2 signals + decision (engine_selection.rs:232-314)
    over synthesized pages: framework/SPA/anti-scraping flags, content
    ratio, probe-first routing."""
    if d.name == "spark":
        parts = "slice(split(html, '<'), 2, greatest(size(split(html, '<')) - 1, 0))"
        between = (
            f"array_join(transform({parts}, p -> CASE WHEN size(split(p, '>')) >= 2 "
            "THEN element_at(split(p, '>'), 2) ELSE '' END), '')"
        )
    else:
        parts = "string_split(html, '<')[2:]"
        between = (
            f"array_to_string(list_transform({parts}, p -> CASE WHEN len(string_split(p, '>')) >= 2 "
            "THEN string_split(p, '>')[2] ELSE '' END), '')"
        )
    flags = {
        "has_react": ("__next_data__", "_reactroot", "data-reactroot", "__webpack_require__"),
        "has_vue": ("v-app", "createapp(", "data-vue-app"),
        "has_angular": ("ng-app", "ng-version", "platformbrowserdynamic", "[ngclass]"),
        "has_spa_markers": ("<!-- rendered by", "__webpack", "window.__initial_state__", "data-react-helmet"),
        "has_anti_scraping": ("cloudflare", "cf-browser-verification", "grecaptcha", "hcaptcha", "perimeterx"),
    }
    flag_cols = []
    for name, needles in flags.items():
        cond = " OR ".join(
            f"instr(lower(html), '{needle.replace(chr(39), chr(39) * 2)}') > 0"
            for needle in needles
        )
        flag_cols.append(f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS INT) AS {name}")
    ratio = (
        f"CAST(ROUND(CASE WHEN length(html) = 0 THEN 0.0 "
        f"ELSE length(trim({between})) * 1.0 / length(html) END, 6) AS DOUBLE)"
    )
    return pages_cte(d) + f""",
  signals AS (
    SELECT doc_id, {', '.join(flag_cols)}, {ratio} AS content_ratio FROM pages
  )
  SELECT doc_id, has_react, has_vue, has_angular, has_spa_markers, has_anti_scraping,
         content_ratio,
         CASE WHEN has_anti_scraping = 1 THEN 'headless'
              WHEN has_react = 1 OR has_vue = 1 OR has_angular = 1 OR has_spa_markers = 1 THEN 'wasm'
              WHEN content_ratio < 0.1 THEN 'wasm'
              ELSE 'wasm' END AS engine
  FROM signals"""


def q_css_transformers(d: Dialect) -> str:
    """The SQL-expressible subset of the 14 CSS content transformers
    (css_extraction.rs:89-113,508-607) over deterministic messy strings:
    trim, normalize_ws, number, currency, date_iso, lowercase, uppercase."""
    messy = (
        f"'  Price: $' || {d.s('doc_id % 900 + 100')} || ',' || "
        f"{d.s('doc_id % 90 + 10')} || '9.99  on ' || "
        f"{d.s('doc_id % 12 + 1')} || '/' || {d.s('doc_id % 28 + 1')} || "
        "'/2024   MiXeD   CaSe '"
    )
    number = "[-+]?\\d*\\.?\\d+([eE][-+]?\\d+)?"
    currency = "[$€£¥]?\\s*(\\d+(?:[.,]\\d{3})*(?:[.,]\\d{2})?)"
    mdy = "(\\d{1,2})/(\\d{1,2})/(\\d{4})"
    if d.name == "spark":
        first_num = f"regexp_extract(messy, {d.re(number)}, 0)"
        currency_amt = f"replace(regexp_extract(messy, {d.re(currency)}, 1), ',', '.')"
        mm = f"regexp_extract(messy, {d.re(mdy)}, 1)"
        dd = f"regexp_extract(messy, {d.re(mdy)}, 2)"
        yy = f"regexp_extract(messy, {d.re(mdy)}, 3)"
    else:
        first_num = f"regexp_extract(messy, {d.re(number)}, 0)"
        currency_amt = f"replace(regexp_extract(messy, {d.re(currency)}, 1), ',', '.')"
        mm = f"regexp_extract(messy, {d.re(mdy)}, 1)"
        dd = f"regexp_extract(messy, {d.re(mdy)}, 2)"
        yy = f"regexp_extract(messy, {d.re(mdy)}, 3)"
    return f"""
  WITH messy_rows AS (SELECT doc_id, {messy} AS messy FROM documents)
  SELECT doc_id,
    trim(messy) AS t_trim,
    {d.rre('trim(messy)', chr(92) + 's+', ' ')} AS t_normalize_ws,
    {first_num} AS t_number,
    {currency_amt} AS t_currency,
    {yy} || '-' || lpad({mm}, 2, '0') || '-' || lpad({dd}, 2, '0') AS t_date_iso,
    lower(messy) AS t_lowercase,
    upper(messy) AS t_uppercase
  FROM messy_rows"""


def q_multimodal_meta(d: Dialect) -> str:
    """Opaque-binary column plumbing: byte lengths + magic sniff over text
    re-encoded as a binary payload (the image/audio analog at parquet level)."""
    blob = "encode(text, 'UTF-8')" if d.name == "spark" else "encode(text)"
    return f"""
  SELECT doc_id,
    CAST(octet_length({blob}) AS BIGINT) AS payload_bytes,
    CAST(length(text) AS BIGINT) AS payload_chars,
    CAST(CASE WHEN octet_length({blob}) = length(text) THEN 1 ELSE 0 END AS INT) AS is_ascii
  FROM documents"""


def q_host_skew(d: Dialect) -> str:
    """Skew diagnostics: per-host doc counts + hot-host flag (>5%)."""
    host = (
        "CASE WHEN doc_id % 11 = 0 THEN 'en.wikipedia.org' "
        "WHEN doc_id % 7 = 0 THEN 'medium.com' "
        "ELSE source || '.example.com' END"
    )
    return f"""
  WITH hosts AS (SELECT {host} AS host FROM documents),
       total AS (SELECT COUNT(*) AS n FROM hosts)
  SELECT h.host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(CASE WHEN COUNT(*) * 1.0 / MAX(t.n) > 0.05 THEN 1 ELSE 0 END AS INT) AS is_hot
  FROM hosts h CROSS JOIN total t
  GROUP BY h.host"""


# Registry: name -> generator
GENERATORS = {
    "gate_features": q_gate_features,
    "gate_score": q_gate_score,
    "gate_route_counts": q_route_counts,
    "validation_flags": q_validation_flags,
    "word_count_reading_time": q_word_count_reading_time,
    "quality_score_tiers": q_quality_tiers,
    "regex_extraction": q_regex_extraction,
    "dedup_exact": q_dedup_exact,
    "minhash_signatures": q_minhash_signatures,
    "minhash_candidate_pairs": q_minhash_pairs,
    "dedup_connected_components": q_dedup_components,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "dedup_embedding_cosine": q_dedup_embedding,
    "simhash_fingerprints": q_simhash,
    "simhash_near_pairs": q_simhash_pairs,
    "token_counts": q_token_counts,
    "langid_stopwords": q_langid,
    "text_quality_signals": q_text_quality,
    "quality_filter_verdicts": q_quality_filter,
    "stratified_sample": q_stratified_sample,
    "doc_fingerprints": q_fingerprints,
    "topk_docs_per_lang": q_topk_per_lang,
    "resume_anti_join": q_resume_anti_join,
    "dim_broadcast_join": q_dim_broadcast_join,
    "events_stats": q_events_stats,
    "events_sessionization": q_sessionization,
    "similarity_cosine_topk": q_cosine_topk,
    "css_transformers": q_css_transformers,
    "topic_keywords": q_topic_keywords,
    "engine_selection": q_engine_selection,
    "multimodal_binary_meta": q_multimodal_meta,
    "host_skew_stats": q_host_skew,
}


def spark_sql(name: str) -> str:
    return GENERATORS[name](SPARK)


def duck_sql(name: str) -> str:
    return GENERATORS[name](DUCK)


# ---------------------------------------------------------------------------
# DuckDB-only oracles for UDF-backed Spark queries.
#
# The queries above are dialect-parallel because both sides are SQL. The
# queries below run a Python/Arrow operator on the Spark side (table
# extraction, PDF parse, …) over *synthesized deterministic inputs*, so the
# oracle can compute the expected output directly from the generating
# columns — an independent derivation, not a re-run of the operator.
# ---------------------------------------------------------------------------


def udf_oracle_table_extraction() -> str:
    """Expected output of ``_q_table_extraction``: the table HTML is
    synthesized per document (header row, two data rows, a colspan=2 row
    for doc_id%3==0, a rowspan=2 pair for doc_id%4==0), so headers /
    row-count / the span-expanded flattened cell matrix are pure functions
    of (doc_id, lang, n_chars)."""
    return """
  SELECT doc_id,
    CAST(1 AS INT) AS n_tables,
    'k|v' AS headers,
    CAST(2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
           + CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 0 END AS INT) AS n_rows,
    'lang|' || lang || '|chars|' || CAST(n_chars AS VARCHAR)
      || CASE WHEN doc_id % 3 = 0 THEN '|wide|wide' ELSE '' END
      || CASE WHEN doc_id % 4 = 0 THEN '|tall|x|tall|y' ELSE '' END AS cells,
    'Doc ' || CAST(doc_id AS VARCHAR) AS caption
  FROM documents"""


def udf_oracle_pdf_extraction() -> str:
    """Expected output of ``_q_pdf_extraction``: the PDF is synthesized
    from (doc_id, text) — one page of text plus an appendix page for even
    ids ('Appendix page.' = 14 chars, 2 words), id%3 images per page —
    and the parser round-trips text exactly with each page newline-
    terminated (processor.rs:692-696), so every column is a pure function
    of the generating row. reading_time = max(words/200, 1)
    (utils.rs:117-121); quality 85."""
    # trim('')→'' splits to [''] (len 1) in DuckDB while Python's
    # str.split() yields [] — guard the empty/whitespace-only class so the
    # oracle does not silently rely on the corpus never containing one.
    words = (
        "(CASE WHEN trim(text) = '' THEN 0"
        " ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)"
        " + CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END"
    )
    return f"""
  SELECT doc_id,
    'Doc ' || CAST(doc_id AS VARCHAR) AS title,
    'Author ' || CAST(doc_id % 7 AS VARCHAR) AS byline,
    CAST({words} AS INT) AS word_count,
    CAST(GREATEST(({words}) // 200, 1) AS INT) AS reading_time,
    CAST(85 AS INT) AS quality_score,
    CAST((doc_id % 3) * (1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS INT) AS n_media,
    CAST(length(text) + 1 + CASE WHEN doc_id % 2 = 0 THEN 15 ELSE 0 END AS INT) AS text_chars
  FROM documents"""


def _duck_lsh_bucket(planes: int, table: int = 0) -> str:
    """The md5-derived hyperplane sign signature (``_plane_component`` /
    ``lsh_signature``) as a DuckDB expression over a DOUBLE[] column v.
    ``table`` selects the OR-construction plane family: table 0 keeps the
    original unsalted ``plane{p}:{i}`` key, others prefix ``t{table}:``
    (``similarity._table_salt``)."""
    salt = "" if table == 0 else f"t{table}:"

    def proj(p: int) -> str:
        plane = (
            f"(CAST(concat('0x', substr(md5('{salt}plane{p}:' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)"
            " / 4294967296.0 - 0.5)"
        )
        return f"list_sum(list_transform(range(0, len(v)), i -> v[i+1] * {plane}))"

    return " + ".join(
        f"(CASE WHEN {proj(p)} > 0 THEN {1 << p} ELSE 0 END)" for p in range(planes)
    )


_DUCK_COS = (
    "CAST(ROUND(list_dot_product(s.v, q.qv)"
    " / (sqrt(list_dot_product(s.v, s.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6)"
    " AS DOUBLE)"
)


def udf_oracle_similarity_ann_lsh(
    planes: int = 6, k: int = 10, query_id: int = 0, hamming: int = 2
) -> str:
    """DuckDB re-derivation of ``similarity.ann_topk_lsh`` (multi-probe):
    the hyperplane components are md5-derived (``_plane_component``), so
    the signature, the Hamming-radius probe filter
    (``bit_count(xor(sig, qsig)) <= hamming`` ≡ the exploded XOR-mask
    probe list) and the exact cosine re-rank are all expressible in SQL.
    Only the *sign* of each projection feeds the bucket, and cosines are
    rounded to 6dp, so float summation-order differences cannot flip the
    result."""
    bucket = _duck_lsh_bucket(planes)
    return f"""
  WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  sig AS (SELECT vec_id, v, {bucket} AS bucket FROM vecs),
  q AS (SELECT bucket AS qb, v AS qv FROM sig WHERE vec_id = {query_id})
  SELECT s.vec_id, {_DUCK_COS} AS cosine_sim
  FROM sig s CROSS JOIN q
  WHERE bit_count(xor(CAST(s.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= {hamming}
    AND s.vec_id != {query_id}
  ORDER BY cosine_sim DESC, s.vec_id ASC
  LIMIT {k}"""


def udf_oracle_similarity_ann_lsh_recall(
    planes: int = 6, k: int = 10, query_id: int = 0, hamming: int = 2
) -> str:
    """Retrieval-quality pin for the LSH ANN (VERDICT r2 'What's wrong
    #2'): recall@k of the multi-probe LSH top-k against the exact
    brute-force top-k, BOTH re-derived in SQL — unlike the IVF pin no
    constant is needed, the whole pipeline is relational."""
    bucket = _duck_lsh_bucket(planes)
    return f"""
  WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  sig AS (SELECT vec_id, v, {bucket} AS bucket FROM vecs),
  q AS (SELECT bucket AS qb, v AS qv FROM sig WHERE vec_id = {query_id}),
  brute AS (
    SELECT s.vec_id FROM sig s CROSS JOIN q
    WHERE s.vec_id != {query_id}
    ORDER BY {_DUCK_COS} DESC, s.vec_id ASC LIMIT {k}),
  approx AS (
    SELECT s.vec_id FROM sig s CROSS JOIN q
    WHERE bit_count(xor(CAST(s.bucket AS BIGINT), CAST(q.qb AS BIGINT))) <= {hamming}
      AND s.vec_id != {query_id}
    ORDER BY {_DUCK_COS} DESC, s.vec_id ASC LIMIT {k}),
  o AS (SELECT COUNT(*) AS n FROM approx JOIN brute USING (vec_id))
  SELECT CAST({k} AS INT) AS k,
         CAST({planes} AS INT) AS planes,
         CAST({hamming} AS INT) AS hamming,
         CAST(n AS INT) AS overlap,
         CAST(ROUND(n / {float(k)}, 6) AS DOUBLE) AS recall_at_k
  FROM o"""


def udf_oracle_similarity_ann_batch_recall(
    planes: int = 6, k: int = 10, hamming: int = 2, query_stride: int = 100
) -> str:
    """Per-query recall of the BATCH multi-probe LSH ANN
    (``ann_topk_lsh_batch``) against the batch brute force
    (``cosine_topk_batch``) for the query set ``vec_id % stride == 0`` —
    fully re-derived in SQL (window-ranked per query on both sides)."""
    bucket = _duck_lsh_bucket(planes)
    return f"""
  WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  sig AS (SELECT vec_id, v, {bucket} AS bucket FROM vecs),
  q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM sig
        WHERE vec_id % {query_stride} = 0),
  scored AS (
    SELECT q.query_id, s.vec_id, {_DUCK_COS} AS cos,
           bit_count(xor(CAST(s.bucket AS BIGINT), CAST(q.qb AS BIGINT))) AS ham
    FROM sig s CROSS JOIN q WHERE s.vec_id != q.query_id),
  brute AS (
    SELECT query_id, vec_id FROM (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored) t WHERE rnk <= {k}),
  approx AS (
    SELECT query_id, vec_id FROM (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored WHERE ham <= {hamming}) t WHERE rnk <= {k}),
  o AS (
    SELECT b.query_id, COUNT(a.vec_id) AS n
    FROM brute b LEFT JOIN approx a USING (query_id, vec_id)
    GROUP BY b.query_id)
  SELECT q.query_id,
         CAST(COALESCE(o.n, 0) AS INT) AS overlap,
         CAST(ROUND(COALESCE(o.n, 0) / {float(k)}, 6) AS DOUBLE) AS recall_at_k
  FROM q LEFT JOIN o USING (query_id)
  ORDER BY q.query_id"""


def udf_oracle_similarity_ann_multi_recall(
    planes: int = 6, k: int = 10, hamming: int = 1, tables: int = 3,
    query_stride: int = 100,
) -> str:
    """Per-query recall of the OR-construction LSH ANN
    (``ann_topk_lsh_batch(tables=L)``): a corpus row is a candidate when
    ANY of the L independent plane families co-buckets it with the query
    within the Hamming probe radius — rendered as an OR over per-table
    ``bit_count(xor(...)) <= hamming`` terms, each table's bucket derived
    from its salted md5 plane keys. Everything else (exact cosine, window
    rank, overlap vs brute force) is the single-table batch-recall oracle
    unchanged."""
    buckets = [_duck_lsh_bucket(planes, table=t) for t in range(tables)]
    sig_cols = ",\n         ".join(
        f"{b} AS b{t}" for t, b in enumerate(buckets)
    )
    q_cols = ", ".join(f"b{t} AS qb{t}" for t in range(tables))
    cand = " OR ".join(
        f"bit_count(xor(CAST(s.b{t} AS BIGINT), CAST(q.qb{t} AS BIGINT))) <= {hamming}"
        for t in range(tables)
    )
    return f"""
  WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  sig AS (SELECT vec_id, v,
         {sig_cols}
         FROM vecs),
  q AS (SELECT vec_id AS query_id, v AS qv, {q_cols} FROM sig
        WHERE vec_id % {query_stride} = 0),
  scored AS (
    SELECT q.query_id, s.vec_id, {_DUCK_COS} AS cos,
           ({cand}) AS cand
    FROM sig s CROSS JOIN q WHERE s.vec_id != q.query_id),
  brute AS (
    SELECT query_id, vec_id FROM (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored) t WHERE rnk <= {k}),
  approx AS (
    SELECT query_id, vec_id FROM (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored WHERE cand) t WHERE rnk <= {k}),
  o AS (
    SELECT b.query_id, COUNT(a.vec_id) AS n
    FROM brute b LEFT JOIN approx a USING (query_id, vec_id)
    GROUP BY b.query_id)
  SELECT q.query_id,
         CAST(COALESCE(o.n, 0) AS INT) AS overlap,
         CAST(ROUND(COALESCE(o.n, 0) / {float(k)}, 6) AS DOUBLE) AS recall_at_k
  FROM q LEFT JOIN o USING (query_id)
  ORDER BY q.query_id"""


def udf_oracle_similarity_ann_ivf() -> str:
    """Measured-constant oracle for the IVF recall@10 query. The IVF
    pipeline is deterministic end-to-end (stride sample, first-k init,
    10 fixed Lloyd iterations, id tie-breaks), so its recall against the
    (value-oracled) brute-force top-k is a constant per corpus — but the
    k-means itself is a driver-side numpy loop that SQL cannot reasonably
    re-derive, so the constants are pinned per corpus, keyed by a data
    fingerprint (round(sum of first components, 4)) rather than re-computed.
    Measured: sf0.001 → 9/10, sf0.01 → 7/10, sf0.1 → 10/10."""
    fp = "(SELECT ROUND(SUM(embedding[1]), 4) FROM embeddings)"
    overlap = (
        f"CASE WHEN {fp} = -1.464 THEN 9"
        f" WHEN {fp} = 1.0824 THEN 7"
        f" WHEN {fp} = 1.5308 THEN 10"
        " ELSE NULL END"
    )
    return f"""
  SELECT CAST(10 AS INT) AS k,
         CAST(8 AS INT) AS n_centroids,
         CAST(2 AS INT) AS n_probe,
         CAST({overlap} AS INT) AS overlap,
         CAST(ROUND(({overlap}) / 10.0, 6) AS DOUBLE) AS recall_at_k"""


_IVF_BATCH_PINS = {
    # embeddings fingerprint -> {query_id: overlap@10}; measured once per
    # corpus (deterministic end-to-end), query 0 agrees with the single-
    # query pin in udf_oracle_similarity_ann_ivf (9 / 7 / 10).
    -1.464: {0: 9, 100: 4, 200: 3, 300: 5, 400: 6},  # sf0.001
    1.0824: {0: 7, 100: 4, 200: 6, 300: 3, 400: 4},  # sf0.01
    1.5308: {0: 10, 100: 5, 200: 2, 300: 2, 400: 5, 500: 4, 600: 7, 700: 1,
             800: 4, 900: 3, 1000: 3, 1100: 4, 1200: 5, 1300: 6, 1400: 6,
             1500: 3, 1600: 8, 1700: 8, 1800: 4, 1900: 5},  # sf0.1
}


def udf_oracle_similarity_ann_ivf_batch_recall(k: int = 10) -> str:
    """Measured-constant oracle for the BATCH IVF recall query (same
    rationale as ``udf_oracle_similarity_ann_ivf``: the k-means is a
    driver-side numpy loop SQL cannot reasonably re-derive, but the whole
    pipeline is deterministic — stride sample, first-k init, fixed Lloyd
    iterations, id tie-breaks — so per-query recalls are constants per
    corpus, keyed by the embeddings fingerprint). An unknown corpus
    yields zero rows → a loud row-count mismatch, never a silent pass."""
    values = ",\n    ".join(
        f"({fp}, {qid}, {ov})"
        for fp, pins in _IVF_BATCH_PINS.items()
        for qid, ov in sorted(pins.items())
    )
    return f"""
  WITH pins(fp, query_id, overlap) AS (VALUES
    {values})
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(overlap AS INT) AS overlap,
         CAST(ROUND(overlap / {float(k)}, 6) AS DOUBLE) AS recall_at_k
  FROM pins
  WHERE fp = (SELECT ROUND(SUM(embedding[1]), 4) FROM embeddings)
  ORDER BY query_id"""


def udf_oracle_native_dom_extraction() -> str:
    """Expected output of ``_q_native_dom``: the synthesized article page
    is simple enough that the native ladder's behavior is a closed form —
    clean text is the content-selector assembly (p texts, then h1, then
    h2: content.rs:108-158), markdown is '# h1' + paragraphs + '## h2'
    (content.rs:160-206), and the quality rubric (quality.rs:7-56) decides
    primary (≥60 and >100 content bytes) vs the body-text fallback
    (title 'Fallback Extraction', quality 40). Both strings are
    reconstructed literally in SQL and measured."""
    words = "len(regexp_split_to_array(trim(clean), '\\s+'))"
    dots = "(length(clean) - length(replace(clean, '.', '')))"
    ind = (
        "(length(md) - length(replace(md, '#', '')))"
        " + (length(md) - length(replace(md, '*', '')))"
        " + (length(md) - length(replace(md, '[', '')))"
    )
    quality = f"""LEAST(20
      + CASE WHEN octet_length(encode(clean)) > 2000 THEN 40
             WHEN octet_length(encode(clean)) > 500 THEN 25
             WHEN octet_length(encode(clean)) > 100 THEN 10 ELSE 0 END
      + CASE WHEN {ind} > 10 THEN 20 WHEN {ind} > 5 THEN 12 WHEN {ind} > 2 THEN 6 ELSE 0 END
      + CASE WHEN {words} > 500 THEN 10 WHEN {words} > 100 THEN 5 ELSE 0 END
      + CASE WHEN {dots} > 10 THEN 10 WHEN {dots} > 3 THEN 5 ELSE 0 END, 100)"""
    return f"""
  WITH base AS (
    SELECT doc_id, text,
      'Doc ' || CAST(doc_id AS VARCHAR) AS docn,
      trim(repeat('alpha beta gamma delta epsilon zeta eta theta. ', 8)) AS fs
    FROM documents
  ),
  built AS (
    SELECT doc_id, docn,
      CASE WHEN doc_id % 2 = 0
        THEN text || chr(10) || fs || chr(10) || docn || chr(10) || 'Section Alpha'
        ELSE text || chr(10) || docn END AS clean,
      CASE WHEN doc_id % 2 = 0
        THEN '# ' || docn || chr(10) || chr(10) || text || chr(10) || chr(10)
             || fs || chr(10) || chr(10) || '## Section Alpha' || chr(10) || chr(10)
        ELSE '# ' || docn || chr(10) || chr(10) || text || chr(10) || chr(10) END AS md,
      trim(repeat('var x=1;', CAST(doc_id % 4 AS INT)) || docn || text
           || CASE WHEN doc_id % 2 = 0 THEN 'Section Alpha' || fs ELSE '' END) AS bodytext
    FROM base
  ),
  scored AS (SELECT *, CAST({quality} AS INT) AS q FROM built)
  SELECT 'https://native.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
    CASE WHEN octet_length(encode(clean)) > 100 AND q >= 60
         THEN docn ELSE 'Fallback Extraction' END AS title,
    CAST(CASE WHEN octet_length(encode(clean)) > 100 AND q >= 60
         THEN length(clean) ELSE length(bodytext) END AS INT) AS text_chars,
    CAST(CASE WHEN octet_length(encode(clean)) > 100 AND q >= 60
         THEN q ELSE 40 END AS INT) AS quality_score,
    CAST(CASE WHEN octet_length(encode(clean)) > 100 AND q >= 60
         THEN length(md) ELSE 0 END AS INT) AS markdown_chars
  FROM scored"""


def udf_oracle_css_field_extraction() -> str:
    """Expected output of ``_q_css_fields`` over the synthesized pages
    (``pages_cte``): <title> is 'Doc N' (normalize_ws is identity on it),
    the h1 field falls back to the title selector on pages without an
    article header (doc_id%5!=0) and matches 'Doc N' either way, and the
    og:title meta exists exactly when doc_id%3==0."""
    return """
  SELECT
    'https://' || (CASE WHEN doc_id % 11 = 0 THEN 'en.wikipedia.org'
                        WHEN doc_id % 7 = 0 THEN 'medium.com'
                        ELSE source || '.example.com' END)
      || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
    'Doc ' || CAST(doc_id AS VARCHAR) AS title,
    'Doc ' || CAST(doc_id AS VARCHAR) AS heading,
    CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_og
  FROM documents"""


def udf_oracle_schema_extraction() -> str:
    """Expected output of ``_q_schema_extraction`` over the synthesized
    pages: the learned article schema extracts (title, content) on pages
    with an <article><h1> (doc_id%5==0 → 2 fields, success), only the
    og:title meta on og-bearing pages (doc_id%3==0 → title 'Doc', 1
    field, no success), and nothing otherwise."""
    return """
  SELECT
    'https://' || (CASE WHEN doc_id % 11 = 0 THEN 'en.wikipedia.org'
                        WHEN doc_id % 7 = 0 THEN 'medium.com'
                        ELSE source || '.example.com' END)
      || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
    CASE WHEN doc_id % 5 = 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR)
         WHEN doc_id % 3 = 0 THEN 'Doc' ELSE NULL END AS title,
    CAST(CASE WHEN doc_id % 5 = 0 THEN 2
              WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS fields_extracted,
    CAST(doc_id % 5 = 0 AS BOOLEAN) AS success
  FROM documents"""


def _fixed_stepped(src: str, window: int) -> str:
    """Nested-select pipeline computing the fixed chunker's step
    (chunking/fixed.rs:27-240 semantics, mirrored from
    functions/chunking.fixed_chunks) from (doc_id, text, n, start0):
    window cap → last-whitespace snap → last-sentence-punctuation snap →
    progress guard → whitespace skip to the next cursor. Text is printable
    ASCII (verified for the corpus), so strpos(' ') == Python isspace."""
    seg2 = "substr(text, start0 + 1, ws_end - start0)"

    def last0(c: str) -> str:
        return (
            f"CASE WHEN strpos(reverse({seg2}), '{c}') > 0"
            f" THEN (ws_end - start0) - strpos(reverse({seg2}), '{c}') ELSE -1 END"
        )

    return f"""(
    SELECT s4.*, endp + length(regexp_extract(substr(text, endp + 1), '^\\s*')) AS next_start
    FROM (
      SELECT s3.*, CASE WHEN snap_end <= start0 THEN cap ELSE snap_end END AS endp
      FROM (
        SELECT s2.*,
          CASE WHEN cap < n AND last0 >= 0 THEN start0 + last0 + 1 ELSE ws_end END AS snap_end
        FROM (
          SELECT s1.*, GREATEST({last0('.')}, {last0('!')}, {last0('?')}) AS last0
          FROM (
            SELECT s0.*,
              CASE WHEN cap < n AND strpos(reverse(seg), ' ') > 0
                   THEN cap - strpos(reverse(seg), ' ')
                   ELSE cap END AS ws_end
            FROM (
              SELECT {src}.*, LEAST(start0 + {window}, n) AS cap,
                     substr(text, start0 + 1, {window}) AS seg
              FROM {src}
            ) s0
          ) s1
        ) s2
      ) s3
    ) s4
  )"""


def udf_oracle_fixed_chunk_spans(size: int = 60) -> str:
    """Expected output of ``_q_fixed_chunk_spans``: a recursive CTE replays
    the fixed chunker's cursor walk exactly — each recursion step is one
    chunk. token_count = int(words * 1.3) with identical IEEE double
    math; texts shorter than 10 chars are a single whole-text chunk and
    empty texts produce zero chunks (both mirrored from fixed_chunks)."""
    window = size * 4
    tokens = (
        "CASE WHEN trim(content) = '' THEN 0 ELSE "
        "CAST(floor(len(regexp_split_to_array(trim(content), '\\s+')) * 1.3) AS BIGINT) END"
    )
    return f"""
  WITH RECURSIVE steps AS (
    SELECT doc_id, text, length(text) AS n, 0 AS start0
    FROM documents WHERE length(text) >= 10
    UNION ALL
    SELECT doc_id, text, n, next_start AS start0
    FROM {_fixed_stepped('steps', window)} stepped
    WHERE next_start < n
  ),
  chunk_rows AS (
    SELECT doc_id, endp, substr(text, start0 + 1, endp - start0) AS content
    FROM {_fixed_stepped('steps', window)} stepped
  ),
  small AS (
    SELECT doc_id, length(text) AS endp, text AS content
    FROM documents WHERE length(text) > 0 AND length(text) < 10
  ),
  all_chunks AS (SELECT * FROM chunk_rows UNION ALL SELECT * FROM small),
  per_doc AS (
    SELECT doc_id, COUNT(*) AS n_chunks, SUM({tokens}) AS total_tokens,
           MAX(endp) AS last_end_pos
    FROM all_chunks GROUP BY doc_id
  )
  SELECT d.doc_id,
         CAST(COALESCE(p.n_chunks, 0) AS INT) AS n_chunks,
         CAST(COALESCE(p.total_tokens, 0) AS BIGINT) AS total_tokens,
         CAST(COALESCE(p.last_end_pos, 0) AS BIGINT) AS last_end_pos
  FROM documents d LEFT JOIN per_doc p USING (doc_id)"""


def _ct(expr: str) -> str:
    """count_tokens(expr) in SQL: int(words * 1.3), identical IEEE math
    (chunking/mod.rs:209-213 / functions/chunking.count_tokens)."""
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0 ELSE "
        f"CAST(floor(len(regexp_split_to_array(trim({expr}), '\\s+')) * 1.3) AS BIGINT) END"
    )


def udf_oracle_chunk_spans(window: int = 60, overlap: int = 12) -> str:
    """Expected output of ``_q_chunk_spans``: a recursive CTE replays the
    sliding-window chunker (sliding.rs:27-198 semantics, mirrored from
    functions/chunking.sliding_window_chunks) one sentence per recursion
    step, carrying (cursor, token/length accumulators, sentence buffer)
    as state.

    Sentence stream: words ending in .!? that are not abbreviations (the
    mod.rs:343-347 list, or ≤4 chars with >1 uppercase) close a sentence;
    sentences under 3 words are dropped. On overflow the chunk is emitted
    and the buffer's maximal token-bounded suffix becomes the overlap
    seed, with the cursor advanced by chunk length minus overlap length.
    The corpus is printable ASCII, so char arithmetic equals the
    reference's byte arithmetic."""
    abbrevs = ", ".join(
        f"'{a}'" for a in sorted(
            {
                "mr.", "mrs.", "ms.", "dr.", "prof.", "sr.", "jr.", "inc.",
                "ltd.", "corp.", "co.", "etc.", "vs.", "vol.", "no.", "pp.",
                "fig.", "ch.", "sec.", "dept.", "govt.", "u.s.", "u.k.",
                "e.g.", "i.e.", "a.m.", "p.m.",
            }
        )
    )
    is_abbrev = (
        f"(lower(w) IN ({abbrevs}) OR "
        "(length(w) <= 4 AND length(regexp_replace(w, '[^A-Z]', '', 'g')) > 1))"
    )
    # Overlap suffix: token counts per buffer element, reversed; the walk
    # takes elements from the end while the running sum stays <= overlap
    # (monotone, so the cutoff is a simple prefix-sum count).
    ov_cnt = (
        "len(list_filter(range(1, len(buffer) + 1), "
        f"k -> list_sum(list_slice(list_reverse(list_transform(buffer, s -> {_ct('s')})), 1, k)) <= {overlap}))"
    )
    ov = (
        f"CASE WHEN brk AND {ov_cnt} > 0 "
        f"THEN array_to_string(list_slice(buffer, len(buffer) - {ov_cnt} + 1, len(buffer)), ' ') "
        "ELSE '' END"
    )
    return f"""
  WITH RECURSIVE
  words AS (
    SELECT doc_id, w, i
    FROM (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w,
             generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS i
      FROM documents WHERE trim(text) <> ''
    ) t
  ),
  flagged AS (
    SELECT doc_id, w, i,
      CASE WHEN regexp_matches(w, '[.!?]$') AND NOT {is_abbrev} THEN 1 ELSE 0 END AS is_end
    FROM words
  ),
  grouped AS (
    SELECT doc_id, w, i,
      COALESCE(SUM(is_end) OVER (PARTITION BY doc_id ORDER BY i
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sent_id
    FROM flagged
  ),
  sentences AS (
    SELECT doc_id, sent_id, string_agg(w, ' ' ORDER BY i) AS sentence,
           COUNT(*) AS n_words
    FROM grouped GROUP BY doc_id, sent_id
  ),
  sent_lists AS (
    SELECT doc_id, list(sentence ORDER BY sent_id) AS sents
    FROM sentences WHERE n_words >= 3 GROUP BY doc_id
  ),
  walk AS (
    SELECT doc_id, sents, len(sents) AS nsent, 0 AS i,
           CAST(0 AS BIGINT) AS cur_tokens, CAST(0 AS BIGINT) AS cur_len,
           CAST(0 AS BIGINT) AS start_pos,
           CAST(0 AS BIGINT) AS n_chunks, CAST(0 AS BIGINT) AS total_tokens,
           CAST([] AS VARCHAR[]) AS buffer
    FROM sent_lists
    UNION ALL
    SELECT doc_id, sents, nsent, i + 1,
           -- append s to the (possibly reset) current chunk
           t_tokens + st AS cur_tokens,
           t_len + (CASE WHEN t_len > 0 THEN 1 ELSE 0 END) + length(s) AS cur_len,
           t_start AS start_pos,
           t_nchunks AS n_chunks,
           t_total AS total_tokens,
           list_append(t_buffer, s) AS buffer
    FROM (
      SELECT s2.*,
        CASE WHEN brk THEN {_ct('ovs')} ELSE cur_tokens END AS t_tokens,
        CASE WHEN brk THEN length(ovs) ELSE cur_len END AS t_len,
        CASE WHEN brk THEN start_pos + cur_len - length(ovs) ELSE start_pos END AS t_start,
        CASE WHEN brk THEN n_chunks + 1 ELSE n_chunks END AS t_nchunks,
        CASE WHEN brk THEN total_tokens + cur_tokens ELSE total_tokens END AS t_total,
        CASE WHEN brk THEN (CASE WHEN ovs <> '' THEN [ovs] ELSE CAST([] AS VARCHAR[]) END)
             ELSE buffer END AS t_buffer
      FROM (
        SELECT s1.*, {ov} AS ovs
        FROM (
          SELECT s0.*, (cur_tokens + st > {window} AND cur_len > 0) AS brk
          FROM (
            SELECT walk.*, sents[i + 1] AS s, {_ct('sents[i + 1]')} AS st
            FROM walk
          ) s0
        ) s1
      ) s2
    ) stepped
    WHERE i < nsent
  ),
  final AS (
    SELECT doc_id,
           n_chunks + (CASE WHEN cur_len > 0 THEN 1 ELSE 0 END) AS n_chunks,
           total_tokens + (CASE WHEN cur_len > 0 THEN cur_tokens ELSE 0 END) AS total_tokens,
           start_pos + cur_len AS last_end_pos
    FROM walk WHERE i = nsent
  )
  SELECT d.doc_id,
         CAST(COALESCE(f.n_chunks, 0) AS INT) AS n_chunks,
         CAST(COALESCE(f.total_tokens, 0) AS BIGINT) AS total_tokens,
         CAST(COALESCE(f.last_end_pos, 0) AS BIGINT) AS last_end_pos
  FROM documents d LEFT JOIN final f USING (doc_id)"""


def udf_oracle_multimodal_decode() -> str:
    """Expected output of ``_q_multimodal_decode``: the BMP generator's
    parameters are closed-form in doc_id — size 8+id%9 × 8+id%7, uniform
    background (id, 2id, 3id mod 256) with one marker pixel (5id, 7id,
    11id mod 256) — so payload size (54-byte headers + padded stride ×
    height), exact integer channel sums and the probe pixel all derive
    directly."""
    w = "(8 + doc_id % 9)"
    h = "(8 + doc_id % 7)"
    n = f"({w} * {h})"
    stride = f"(({w} * 3 + 3) // 4 * 4)"
    return f"""
  SELECT doc_id,
    'image/bmp' AS media_type,
    CAST(54 + {h} * {stride} AS BIGINT) AS payload_bytes,
    CAST({w} AS INT) AS width,
    CAST({h} AS INT) AS height,
    CAST((doc_id % 256) * ({n} - 1) + (doc_id * 5) % 256 AS BIGINT) AS sum_r,
    CAST(((doc_id * 2) % 256) * ({n} - 1) + (doc_id * 7) % 256 AS BIGINT) AS sum_g,
    CAST(((doc_id * 3) % 256) * ({n} - 1) + (doc_id * 11) % 256 AS BIGINT) AS sum_b,
    CAST((doc_id * 5) % 256 AS INT) AS probe_r,
    CAST((doc_id * 7) % 256 AS INT) AS probe_g,
    CAST((doc_id * 11) % 256 AS INT) AS probe_b
  FROM documents"""


def udf_oracle_strategy_composition() -> str:
    """Expected output of ``_q_strategy_composition`` (BEST-of
    {article, dom, css}) over the synthesized pages, derived in closed
    form per page class:

    * every strategy's confidence = quality/100 where quality =
      30 + title tier (title is always 'Doc N') + content-length tier
      + 5 (lang attr present); author/date/links/media/categories are
      absent and word counts never reach a tier on this corpus;
    * article content: the <article> inner text ('Doc N'+text) when it
      clears the 200-byte gate (extract.py:151-158), else the full-page
      fallback (script text + ['Doc N' on article pages] + text);
    * css content (selectors ['article p', 'p']): both selector results
      concatenated — text twice + 2 separator chars on article pages,
      text otherwise;
    * dom: the native body fallback, quality 40 (the corpus has no
      sentence punctuation or markdown indicator characters — verified —
      so the primary ladder can never reach 60);
    * winner = LAST of the tied maxima in [article, dom, css] order
      (Rust max_by semantics, composition.rs)."""

    def tier(L: str) -> str:
        return (
            f"CASE WHEN {L} > 2000 THEN 20 WHEN {L} > 1000 THEN 15 "
            f"WHEN {L} > 500 THEN 10 WHEN {L} > 200 THEN 5 ELSE 0 END"
        )

    return f"""
  WITH base AS (
    SELECT doc_id, source, length(text) AS n,
      4 + length(CAST(doc_id AS VARCHAR)) AS dl,
      8 * (doc_id % 4) AS sc
    FROM documents
  ),
  lens AS (
    SELECT *,
      CASE WHEN dl > 10 AND dl < 100 THEN 15 WHEN dl > 5 THEN 8 ELSE 0 END AS tt,
      CASE WHEN doc_id % 5 = 0 THEN
        CASE WHEN dl + n > 200 THEN dl + n ELSE sc + dl + n END
      ELSE sc + n END AS la,
      CASE WHEN doc_id % 5 = 0 THEN 2 * n + 2 ELSE n END AS lc,
      sc + (CASE WHEN doc_id % 5 = 0 THEN dl ELSE 0 END) + n AS ld
    FROM base
  ),
  conf AS (
    SELECT *,
      (30 + tt + {tier('la')} + 5) / 100.0 AS ca,
      0.40 AS cd,
      (30 + tt + {tier('lc')} + 5) / 100.0 AS cc
    FROM lens
  )
  SELECT
    'https://' || (CASE WHEN doc_id % 11 = 0 THEN 'en.wikipedia.org'
                        WHEN doc_id % 7 = 0 THEN 'medium.com'
                        ELSE source || '.example.com' END)
      || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
    CASE WHEN cc >= ca AND cc >= cd THEN 'css'
         WHEN cd >= ca THEN 'dom' ELSE 'article' END AS strategy_used,
    CAST(CASE WHEN cc >= ca AND cc >= cd THEN cc
              WHEN cd >= ca THEN cd ELSE ca END AS DOUBLE) AS confidence,
    CAST(CASE WHEN cc >= ca AND cc >= cd THEN lc
              WHEN cd >= ca THEN ld ELSE la END AS INT) AS content_len
  FROM conf"""


def udf_oracle_topic_chunk_spans() -> str:
    """Pinned-constant oracle for the TextTiling query: the fixture text
    is a pure function of (doc_id%4, doc_id%3==0), so the 8 input classes
    enumerate completely. Constants below are the measured outputs of the
    deterministic chunker on each class (2 topic blocks → 2 chunks / 116
    tokens, 3 blocks → 3 chunks / 174 tokens; end positions differ per
    block rotation) — a frozen regression pin, since the float depth
    curve + hysteresis walk is not reasonably SQL-derivable."""
    measured = {
        (0, 0): (2, 116, 599), (0, 1): (3, 174, 914),
        (1, 0): (2, 116, 589), (1, 1): (3, 174, 934),
        (2, 0): (2, 116, 659), (2, 1): (3, 174, 984),
        (3, 0): (2, 116, 669), (3, 1): (3, 174, 944),
    }
    arms = []
    for (m4, m3), (n, tok, end) in sorted(measured.items()):
        cond = f"doc_id % 4 = {m4} AND (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) = {m3}"
        arms.append((cond, n, tok, end))

    def case(idx: int) -> str:
        return "CASE " + " ".join(
            f"WHEN {cond} THEN {vals[idx]}"
            for cond, *vals in [(a[0], a[1], a[2], a[3]) for a in arms]
        ) + " END"

    return f"""
  SELECT doc_id,
    CAST({case(0)} AS INT) AS n_chunks,
    CAST({case(1)} AS BIGINT) AS total_tokens,
    CAST({case(2)} AS BIGINT) AS last_end_pos
  FROM documents"""


def udf_oracle_corpus_curation() -> str:
    """Expected output of ``_q_corpus_curation``: the same three stages
    derived relationally — md5-fingerprint groups (keep min id), the
    recursive-CTE transitive closure over MinHash candidate pairs
    (embedded as a derived table, the same construction
    ``q_dedup_components`` pins), and the shared Gopher keep expression —
    with the exact_dup > near_dup > low_quality > kept precedence."""
    keep = quality_keep_expr(DUCK, "f.text")
    components = q_dedup_components(DUCK)
    return _DUP_CORPUS + f""",
  fp AS (
    SELECT doc_id, text,
           md5({DUCK.rre('trim(lower(text))', _WS, ' ')}) AS fp
    FROM corpus
  ),
  keepers AS (SELECT fp, MIN(doc_id) AS keep_id FROM fp GROUP BY fp)
  SELECT f.doc_id,
    CASE WHEN f.doc_id != k.keep_id THEN 'exact_dup'
         WHEN c.component_id IS NOT NULL AND c.component_id != f.doc_id THEN 'near_dup'
         WHEN NOT {keep} THEN 'low_quality'
         ELSE 'kept' END AS verdict,
    CAST({keep} AS BOOLEAN) AS quality_ok
  FROM fp f
  JOIN keepers k USING (fp)
  LEFT JOIN ({components}) c ON c.doc_id = f.doc_id"""


def udf_oracle_extract_pipeline_invariants() -> str:
    """Oracled invariant companion for the flagship ``extract_pipeline``
    (whose per-field output is pinned byte-identical by the WASM goldens,
    ``tests/test_golden.py``, but whose 500-row corpus run was the one
    remaining rows-only driver check). Four aggregate invariants, each a
    pure function of the generating ``documents`` table:

    * per-``content_mode`` row counts ≡ the gate route derivation (the
      same expression ``gate_route_counts`` already pins);
    * zero error rows (the synthesized corpus is entirely valid);
    * every row extracts a title (n_title_nonnull == n_docs);
    * every row's ``word_count`` lies in the envelope
      ``[doc_words, doc_words + doc_id%4 + 1]`` where ``doc_words`` is the
      ``word_count_reading_time`` derivation over ``documents.text`` —
      the ``doc_id%4`` script tags glue exactly that many extra
      whitespace words ("var x=1;…" runs into the first text word) and
      the article pages' h1 prefix adds at most one more ("Doc" splits
      off, the number glues). Extraction may never LOSE a word."""
    route = q_route_counts(DUCK)
    return f"""
  SELECT content_mode,
         CAST(n_docs AS BIGINT) AS n_docs,
         CAST(0 AS BIGINT) AS n_errors,
         CAST(n_docs AS BIGINT) AS n_title_nonnull,
         CAST(n_docs AS BIGINT) AS n_wc_in_envelope
  FROM ({route}) r"""


def udf_oracle_extract_pipeline() -> str:
    """FULL value oracle for the flagship ``extract_pipeline`` run over the
    synthesized corpus — closes the last ``no_oracle`` row (VERDICT r3
    next-round #3). Every output column (url, title, extracted_text,
    content_mode, quality_score, word_count) is re-derived in closed form
    from the generating ``documents`` table, because the page templates
    (``pages_cte``) make the extractor's behavior enumerable:

    * route: the same gate-score derivation ``gate_route_counts`` pins
      (gate.rs:83-137, 233-246) — raw ≥ 0.7, headless ≤ 0.3 ∨ spa ≥ 3,
      else probes_first;
    * article pass (lib.rs:479-509): the <article> inner text
      ('Doc N' + text, h1/p concatenated with no separator) when the page
      has one AND its trimmed UTF-8 length exceeds 200 bytes, else the
      <body> inner text (script texts included — inner_text concatenates
      all descendant text nodes);
    * article quality (lib.rs basic+enhanced): 30 + title-length bonus
      (+8 when 'Doc N' exceeds 5 bytes, i.e. doc_id ≥ 10) + content-byte
      bonus + word bonus + 5 for the always-detected html[lang] language;
    * probes-first escalation (engine_selection.rs:450-469):
      wc < 50 ∨ (q < 50 ∧ wc < 100); the native ladder's quality rubric
      (quality.rs:7-56) cannot reach 60 on this corpus (≤ ~580 text
      bytes, no sentences/markdown indicators → ≤ 50), so every escalated
      or headless row takes the body-text fallback: title 'Fallback
      Extraction', quality 40, text = body inner text
      (fallbacks.rs:19-41).

    The derivation is per-document, so the driver hash pins every byte of
    every extracted_text — stronger than the aggregate invariants row."""
    words_art = f"len(regexp_split_to_array(trim(t_art), '{_WS}'))"
    words_body = f"len(regexp_split_to_array(trim(bodytext), '{_WS}'))"
    return (
        pages_cte(DUCK)
        + ", feats AS ("
        + _gate_features_select(DUCK)
        + f"), scored AS (SELECT doc_id, spa_markers, {_SCORE_EXPR} FROM feats),"
        + """
  routed AS (
    SELECT doc_id,
      CASE WHEN gate_score >= 0.7 THEN 'raw'
           WHEN gate_score <= 0.3 OR spa_markers >= 3 THEN 'headless'
           ELSE 'probes_first' END AS content_mode
    FROM scored),
  base AS (
    SELECT p.doc_id, p.url, p.text, r.content_mode,
      'Doc ' || CAST(p.doc_id AS VARCHAR) AS docn,
      repeat('var x=1;', CAST(p.doc_id % 4 AS INT)) AS sc
    FROM pages p JOIN routed r USING (doc_id)),
  built AS (
    SELECT *,
      sc || (CASE WHEN doc_id % 5 = 0 THEN docn || text ELSE text END) AS bodytext
    FROM base),
  art AS (
    SELECT *,
      CASE WHEN doc_id % 5 = 0 AND octet_length(encode(trim(docn || text))) > 200
           THEN trim(docn || text) ELSE trim(bodytext) END AS t_art
    FROM built),
"""
        + f"""
  artwc AS (SELECT *, {words_art} AS wc_art FROM art),
  artq AS (
    SELECT *,
      LEAST(30
        + CASE WHEN octet_length(encode(docn)) > 10 AND octet_length(encode(docn)) < 100 THEN 15
               WHEN octet_length(encode(docn)) > 5 THEN 8 ELSE 0 END
        + CASE WHEN octet_length(encode(t_art)) > 2000 THEN 20
               WHEN octet_length(encode(t_art)) > 1000 THEN 15
               WHEN octet_length(encode(t_art)) > 500 THEN 10
               WHEN octet_length(encode(t_art)) > 200 THEN 5 ELSE 0 END
        + CASE WHEN wc_art > 500 THEN 10 WHEN wc_art > 200 THEN 5 ELSE 0 END
        + 5, 100) AS q_art
    FROM artwc),
  decided AS (
    SELECT *,
      (content_mode = 'headless') OR
      (content_mode = 'probes_first'
       AND (wc_art < 50 OR (q_art < 50 AND wc_art < 100))) AS use_fallback
    FROM artq)
  SELECT url,
    CASE WHEN use_fallback THEN 'Fallback Extraction' ELSE docn END AS title,
    CASE WHEN use_fallback THEN trim(bodytext) ELSE t_art END AS extracted_text,
    content_mode,
    CAST(CASE WHEN use_fallback THEN 40 ELSE q_art END AS INT) AS quality_score,
    CAST(CASE WHEN use_fallback THEN {words_body} ELSE wc_art END AS INT) AS word_count
  FROM decided"""
    )


def udf_oracle_extract_golden_fixtures() -> str:
    """The reference's own golden snapshots as driver-visible constants:
    expected (title, quality_score, word_count, md5(extracted_text)) per
    golden case, read from the read-only reference checkout at SQL
    generation time (``wasm/riptide-extractor-wasm/tests/golden/
    snapshots/*.json`` — the same files ``tests/test_golden.py`` pins
    field-by-field). The Spark side runs the real extraction UDF over the
    fixture HTML; hash agreement here IS byte-identity of the extracted
    text vs the reference's goldens, surfaced as an oracled CORRECTNESS
    row instead of only a pytest pin (VERDICT r3 next-round #3)."""
    import hashlib

    from .sources.golden import GOLDEN_CASES, load_snapshot

    rows = []
    for name, _fixture, url, mode in GOLDEN_CASES:
        snap = load_snapshot(name)
        digest = hashlib.md5(snap["text"].encode("utf-8")).hexdigest()
        title = (snap["title"] or "").replace("'", "''")
        rows.append(
            f"('{name}', '{url}', '{mode}', '{title}', "
            f"CAST({snap['quality_score']} AS INT), "
            f"CAST({snap['word_count']} AS INT), '{digest}')"
        )
    values = ",\n    ".join(rows)
    return f"""
  SELECT * FROM (VALUES
    {values})
  AS t(case_name, url, mode, title, quality_score, word_count, text_md5)"""


def udf_oracle_events_windowed_counts() -> str:
    """Expected output of ``_q_events_windowed_counts``: Spark's tumbling
    ``window(ts, '10 minutes')`` ≡ DuckDB ``time_bucket``; counts and
    6dp-rounded value sums per (window, event_type)."""
    return """
  SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
         time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(ROUND(SUM(value), 6) AS DOUBLE) AS sum_value
  FROM events
  GROUP BY 1, 2, 3"""


UDF_ORACLES = {
    "chunk_spans": udf_oracle_chunk_spans,
    "extract_pipeline": udf_oracle_extract_pipeline,
    "extract_golden_fixtures": udf_oracle_extract_golden_fixtures,
    "extract_pipeline_invariants": udf_oracle_extract_pipeline_invariants,
    "events_windowed_counts": udf_oracle_events_windowed_counts,
    "corpus_curation": udf_oracle_corpus_curation,
    "strategy_composition": udf_oracle_strategy_composition,
    "topic_chunk_spans": udf_oracle_topic_chunk_spans,
    "multimodal_decode": udf_oracle_multimodal_decode,
    "css_field_extraction": udf_oracle_css_field_extraction,
    "fixed_chunk_spans": udf_oracle_fixed_chunk_spans,
    "schema_extraction": udf_oracle_schema_extraction,
    "table_extraction": udf_oracle_table_extraction,
    "pdf_extraction": udf_oracle_pdf_extraction,
    "similarity_ann_lsh": udf_oracle_similarity_ann_lsh,
    "similarity_ann_lsh_recall": udf_oracle_similarity_ann_lsh_recall,
    "similarity_ann_batch_recall": udf_oracle_similarity_ann_batch_recall,
    "similarity_ann_multi_recall": udf_oracle_similarity_ann_multi_recall,
    "similarity_ann_ivf_batch_recall": udf_oracle_similarity_ann_ivf_batch_recall,
    "similarity_ann_ivf": udf_oracle_similarity_ann_ivf,
    # Materialized-index twins (VERDICT r3 next-round #4): the partition-
    # pruned read paths return the same rows/recall as the in-memory
    # paths, so they share those oracles; the plan gate (PartitionFilters
    # over the probe set) is asserted INSIDE the driver query.
    "similarity_ann_lsh_indexed": udf_oracle_similarity_ann_lsh,
    "similarity_ann_ivf_indexed": udf_oracle_similarity_ann_ivf,
    "native_dom_extraction": udf_oracle_native_dom_extraction,
}


def udf_oracles() -> dict[str, str]:
    out = {}
    for name, gen in UDF_ORACLES.items():
        if name == "extract_golden_fixtures":
            # This one renders constants read from the read-only reference
            # checkout; on a host without it, omit the single entry instead
            # of failing the whole oracle surface (its queries() twin is
            # gated on the same predicate, so the pair drops together).
            from .sources.golden import reference_available

            if not reference_available():
                continue
        out[name] = gen()
    return out
