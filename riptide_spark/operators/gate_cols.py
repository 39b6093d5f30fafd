"""Adaptive-routing gate as *native Spark column expressions* (P5-P8).

The reference computes gate features with plain string scans
(``/root/reference/crates/riptide-api/src/pipeline.rs:769-841``), scores them
(``crates/riptide-reliability/src/gate.rs:83-137``) and picks a route
(``gate.rs:233-246``). All of that is branch-free arithmetic over substring
counts — ideal for whole-stage codegen, so this module expresses it entirely
with built-in functions (zero Python in the hot path). The pure-Python oracle
in ``riptide_spark/functions/gate.py`` pins the semantics;
``tests/test_gate_spark.py`` asserts the two agree row-for-row.

Byte/char note: the Rust code counts UTF-8 *bytes* for ``html_bytes`` /
``script_bytes`` and *chars* for everything else. ``html_bytes`` uses
``octet_length`` (exact); ``script_bytes`` uses char arithmetic over the
decoded string, which equals the byte count whenever script content is ASCII
(HTML markup always is; the corpus generator keeps scripts ASCII). The
divergence is bounded and documented — and irrelevant to the score unless a
page has non-ASCII inside <script>, where the f32-vs-f64 tolerance already
applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GATE_HI = 0.7
GATE_LO = 0.3

_CONTROL_CLASS = "[\\x00-\\x1F\\x7F-\\x9F]"

# Σ over segments after each '<script': index of '</script>' + 9, else the
# full segment length (pipeline.rs:785-793). instr is 1-based → instr + 8.
_SCRIPT_BYTES_EXPR = (
    "aggregate(slice(split({c}, '<script'), 2, greatest(size(split({c}, '<script')) - 1, 0)), "
    "0L, (acc, p) -> acc + CASE WHEN instr(p, '</script>') > 0 "
    "THEN CAST(instr(p, '</script>') + 8 AS LONG) ELSE CAST(length(p) AS LONG) END)"
)


def decoded_html(html_col: str = "html") -> Column:
    """Lossy UTF-8 decode of the binary html column (pipeline.rs:332)."""
    return F.decode(F.col(html_col), "UTF-8")


def gate_feature_columns(page: Column, url: Column, html_col: str = "html") -> dict[str, Column]:
    """All GateFeatures as columns over the decoded page string."""
    count = lambda pat: F.regexp_count(page, F.lit(pat))  # noqa: E731
    script_bytes = F.expr(_SCRIPT_BYTES_EXPR.format(c=f"decode({html_col}, 'UTF-8')"))
    html_bytes = F.octet_length(page).cast("long")
    spa_markers = (
        F.when(page.contains("__NEXT_DATA__"), 1).otherwise(0)
        + F.when(page.contains("data-reactroot") | page.contains("data-react-helmet"), 1).otherwise(0)
        + F.when(page.contains('id="root"') & (count("<div") > 20), 1).otherwise(0)
        + F.when(script_bytes > (html_bytes / F.lit(2)).cast("long"), 1).otherwise(0)
    )
    host = F.lower(F.coalesce(F.parse_url(url, F.lit("HOST")), F.lit("")))
    domain_prior = (
        F.when(host.contains("wikipedia.") | host.contains("github."), F.lit(0.9))
        .when(host.contains("medium.") | host.contains("dev.to"), F.lit(0.8))
        .otherwise(F.lit(0.5))
    )
    return {
        "html_bytes": html_bytes,
        "visible_text_chars": F.length(F.regexp_replace(page, _CONTROL_CLASS, "")).cast("long"),
        "p_count": count("<p"),
        "article_count": count("<article") + count("<main"),
        "h1h2_count": count("<h1") + count("<h2"),
        "script_bytes": script_bytes,
        "has_og": page.contains('property="og:') | page.contains("property='og:"),
        "has_jsonld_article": page.contains('"@type":"Article"')
        | page.contains("'@type':'Article'"),
        "spa_markers": spa_markers.cast("int"),
        "domain_prior": domain_prior,
    }


def _clamp(col: Column, lo: float, hi: float) -> Column:
    return F.greatest(F.lit(lo), F.least(F.lit(hi), col))


def gate_score_column(f: dict[str, Column]) -> Column:
    """gate.rs:83-137 as one codegen-friendly expression."""
    html_bytes_d = f["html_bytes"].cast("double")
    text_ratio = F.when(f["html_bytes"] == 0, F.lit(0.0)).otherwise(
        f["visible_text_chars"].cast("double") / html_bytes_d
    )
    script_density = F.when(f["html_bytes"] == 0, F.lit(0.0)).otherwise(
        f["script_bytes"].cast("double") / html_bytes_d
    )
    score = (
        _clamp(text_ratio * 1.2, 0.0, 0.6)
        + _clamp(F.log(f["p_count"].cast("double") + 1.0) * 0.06, 0.0, 0.3)
        + F.when(f["article_count"] > 0, 0.15).otherwise(0.0)
        + F.when(f["has_og"], 0.08).otherwise(0.0)
        + F.when(f["has_jsonld_article"], 0.12).otherwise(0.0)
        - _clamp(script_density * 0.8, 0.0, 0.4)
        - F.when(f["spa_markers"] >= 2, 0.25).otherwise(0.0)
        + (f["domain_prior"] - 0.5) * 0.1
    )
    return _clamp(score, 0.0, 1.0)


def content_mode_column(
    url: Column,
    html: Column,
    score: Column,
    spa_markers: Column,
    hi: float = GATE_HI,
    lo: float = GATE_LO,
) -> Column:
    """P7/P8: PDF bypass first, then the three-tier decision."""
    is_pdf = F.lower(url).endswith(".pdf") | (
        F.substring(html, 1, 5) == F.lit(b"%PDF-")
    )
    return (
        F.when(is_pdf, F.lit("pdf"))
        .when(score >= hi, F.lit("raw"))
        .when((score <= lo) | (spa_markers >= 3), F.lit("headless"))
        .otherwise(F.lit("probes_first"))
    )


def with_gate(df, url_col: str = "url", html_col: str = "html"):
    """Append gate feature, score and content_mode columns to a pages DF."""
    page = decoded_html(html_col)
    feats = gate_feature_columns(page, F.col(url_col), html_col)
    df = df.withColumns(feats)
    score = gate_score_column({k: F.col(k) for k in feats})
    df = df.withColumn("gate_score", score)
    return df.withColumn(
        "content_mode",
        content_mode_column(
            F.col(url_col), F.col(html_col), F.col("gate_score"), F.col("spa_markers")
        ),
    )
