"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed with built-in Spark functions (JVM-side,
codegen-friendly, no Python in the hot path) so Catalyst can push, prune and
partially aggregate them at 100 TB:

* **exact**: md5 fingerprint → groupBy. One shuffle on a 16-byte key.
* **MinHash**: word-shingles → k md5-derived min-hashes → band buckets →
  bucket join for candidate pairs. The classic shingle→minhash→band→bucket
  LSH cascade; every stage is an array expression, the only shuffle is the
  final bucket groupBy.
* **n-gram Jaccard**: exact verification for candidate pairs via a shingle
  equi-join (explode → join → count / union-size).
* **SimHash**: 16-bit sign-vote fingerprint over word hashes (Hamming-style
  near-dup families).

Hashes are md5-derived (not Spark's xxhash64) so every result is
reproducible in any engine — the DuckDB oracles in ``__spark_entry__.py``
recompute them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 3
DEFAULT_MINHASHES = 8
DEFAULT_SIMHASH_BITS = 16


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed lowercase normalization for fingerprinting."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def exact_fingerprint(text: Column) -> Column:
    return F.md5(normalized_text(text))


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents."""
    return (
        df.select(F.col(id_col), exact_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(text: Column, k: int = DEFAULT_SHINGLE) -> Column:
    """k-word shingles of the lowercased text (distinct not applied)."""
    words = _words(F.lower(text))
    n = F.size(words)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(words, i, k), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))


def _hash60(col: Column) -> Column:
    """First 15 hex chars of md5 as a bigint (portable across engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_signature(text: Column, num_hashes: int = DEFAULT_MINHASHES, k: int = DEFAULT_SHINGLE) -> list[Column]:
    """k independent min-hashes: min over shingles of md5('<i>:'||shingle)."""
    sh = shingles(text, k)

    def _hasher(i: int):
        return lambda s: _hash60(F.concat(F.lit(f"{i}:"), s))

    return [
        F.array_min(F.transform(sh, _hasher(i))).alias(f"minhash_{i}")
        for i in range(num_hashes)
    ]


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_hashes: int = DEFAULT_MINHASHES) -> DataFrame:
    return df.select(F.col(id_col), *minhash_signature(F.col(text_col), num_hashes))


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_MINHASHES,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket id; documents
    sharing any (band, bucket) are near-dup candidates."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes)
    bands = []
    for b in range(num_hashes // band_size):
        cols = [F.col(f"minhash_{b * band_size + j}") for j in range(band_size)]
        bucket = F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))
        bands.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_candidate_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                            num_hashes: int = DEFAULT_MINHASHES, band_size: int = 2) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH bucket."""
    buckets = minhash_band_buckets(df, text_col, id_col, num_hashes, band_size)
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over shingle-join candidates.

    explode(distinct shingles) → self equi-join on shingle (only documents
    sharing a shingle ever meet — the join key *is* the blocking) →
    |A∩B| / (|A|+|B|−|A∩B|). The size-ratio filter (J ≥ t ⇒
    min(|A|,|B|)/max(|A|,|B|) ≥ t) rides in the join condition so
    size-incompatible pairs die inside the join instead of surviving to
    the aggregate — identical results, less shuffle/aggregate volume.
    """
    sh = df.select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), k)).alias("sh")
    )
    sizes = sh.select(id_col, F.size("sh").alias("n"))
    exploded = sh.select(id_col, F.explode("sh").alias("shingle")).join(
        sizes, id_col
    )
    pairs = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.n") >= threshold * F.col("b.n"))
            & (F.col("b.n") >= threshold * F.col("a.n")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprint(text: Column, bits: int = DEFAULT_SIMHASH_BITS) -> Column:
    """Sign-vote SimHash over word hashes: bit b set iff Σ±1 votes > 0."""
    words = _words(F.lower(text))
    hashes = F.transform(words, _hash60)
    def _voter(bit: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    total = F.lit(0).cast("bigint")
    for b in range(bits):
        votes = F.aggregate(hashes, F.lit(0).cast("bigint"), _voter(b))
        total = total + F.when(votes > 0, F.lit(1 << b).cast("bigint")).otherwise(0)
    return total


def simhash_fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                         bits: int = DEFAULT_SIMHASH_BITS) -> DataFrame:
    return df.select(
        F.col(id_col), simhash_fingerprint(F.col(text_col), bits).alias("simhash")
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = True,
    planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    Scale path (default): random-hyperplane LSH signatures block the
    self-join — only rows sharing a bucket are compared, O(rows²/buckets)
    instead of O(rows²). Exact cosine re-ranks inside the bucket. With
    ``use_lsh=False`` the join is the exact O(n²) baseline (the oracle
    shape). Near-identical vectors agree on every hyperplane sign, so LSH
    recall on true near-duplicates is ~1 by construction.
    """
    from .similarity import cosine, lsh_signature

    vec = F.col(vec_col).cast("array<double>")
    if use_lsh:
        with_sig = df.select(
            F.col(id_col), vec.alias("v"), lsh_signature(vec, planes).alias("bucket")
        )
        join_cond = (F.col("a.bucket") == F.col("b.bucket")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
    else:
        with_sig = df.select(F.col(id_col), vec.alias("v"))
        join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    pairs = with_sig.alias("a").join(with_sig.alias("b"), join_cond)
    scored = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine(F.col("a.v"), F.col("b.v")), 6).cast("double").alias("cosine_sim"),
    )
    return scored.filter(F.col("cosine_sim") >= threshold)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """Resolve candidate pairs into duplicate clusters: per node, the
    minimum id reachable through the pair graph (= canonical doc id).

    The step after MinHash-LSH at corpus scale: candidate pairs form a
    graph whose connected components are the duplicate clusters; keeping
    ``component`` per cluster deduplicates transitively (A~B, B~C ⇒ one
    survivor even though A,C never shared a bucket).

    Adaptive execution: the candidate graph is tiny relative to the
    corpus (only docs with near-duplicates appear), so when the edge
    count is at most ``driver_edge_threshold`` the edges are collected
    and solved with union-find on the driver — O(E α(E)), one Spark
    action, no iterations. Above the threshold: distributed min-label
    propagation — each round every node takes ``min(own label,
    neighbors' labels)``; fixpoint in O(diameter) rounds (duplicate
    clusters are near-cliques, so 2-3 rounds in practice), convergence
    detected by the monotone non-increasing sum of labels, and
    ``localCheckpoint`` truncates lineage each round (the classic
    iterative-algorithm hazard at scale). Both paths are deterministic
    (min() has no ties) and produce identical labels.
    """
    spark = pairs.sparkSession
    # Materialize the edge list once — its lineage (e.g. the whole MinHash
    # candidate generation) would otherwise re-execute on every iteration's
    # join against the evolving labels.
    edge_rows_df = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    ).localCheckpoint()
    n_edges = edge_rows_df.count()

    if n_edges <= driver_edge_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for row in edge_rows_df.collect():
            a, b = row["src"], row["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # Union by min id keeps the canonical-label invariant.
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = [(node, find(node)) for node in parent]
        return spark.createDataFrame(rows, "node long, component long")

    edges = edge_rows_df.union(
        edge_rows_df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    converged = labels.count() == 0  # empty graph is trivially converged
    for _ in range(max_iter):
        if converged:
            break
        nbr_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("nbr_node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # Compute the new label AND whether it changed in one pass; the
        # changed-count convergence check is overflow-safe (a sum of the
        # labels themselves would overflow BIGINT under ANSI mode once
        # ids are large hashes, e.g. 2^62-scale fingerprints).
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["nbr_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).cast("int").alias("changed"),
            )
            .localCheckpoint()
        )
        changed = stepped.agg(F.sum("changed")).collect()[0][0] or 0
        labels = stepped.select("node", "component")
        converged = changed == 0
    if not converged:
        # Silent truncation would report one duplicate cluster as several;
        # min-label propagation moves the minimum one hop per round, so a
        # duplicate chain longer than max_iter needs a bigger budget (or
        # pointer-jumping) — fail loudly instead of deduplicating wrongly.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the candidate graph has components with diameter > max_iter — "
            "raise max_iter"
        )
    return labels
