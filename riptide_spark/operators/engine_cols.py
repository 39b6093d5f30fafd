"""Engine-selection v2 — content-signal routing as native columns (P9).

Port of ``/root/reference/crates/riptide-reliability/src/engine_selection.rs
:232-314`` (framework/SPA/anti-scraping detection + content ratio) and
``:484-499`` (content ratio). All whole-stage-codegen expressions; the
probe-first flag decides whether framework/low-ratio pages try the fast
path first (the row-local escalation in extract_udf) or go straight to the
heavy DOM path.

The domain warm-start cache (``:39-60`` — skip analysis for known domains)
maps to a broadcast join against a small (host → engine) decision table,
provided by :func:`with_cached_engine`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REACT = ("__next_data__", "_reactroot", "data-reactroot", "__webpack_require__")
_VUE = ("v-app", "createapp(", "data-vue-app")
_ANGULAR = ("ng-app", "ng-version", "platformbrowserdynamic", "[ngclass]")
_SPA = ("<!-- rendered by", "__webpack", "window.__initial_state__", "data-react-helmet")
_ANTI_SCRAPING = (
    "cloudflare",
    "cf-browser-verification",
    "grecaptcha",
    "hcaptcha",
    "perimeterx",
)


def _contains_any(lower: Column, needles: tuple[str, ...]) -> Column:
    expr = F.lit(False)
    for needle in needles:
        expr = expr | lower.contains(needle)
    return expr


def content_ratio_column(page: Column) -> Column:
    """engine_selection.rs:484-499: text between tags / total length.

    Rust: ``html.split('<').filter_map(|s| s.split('>').nth(1)).collect()``
    — for each '<'-segment, the piece between the first and second '>'."""
    parts = F.slice(
        F.split(page, "<"), 2, F.greatest(F.size(F.split(page, "<")) - 1, F.lit(0))
    )
    between = F.transform(
        parts,
        lambda p: F.when(
            F.size(F.split(p, ">")) >= 2, F.element_at(F.split(p, ">"), 2)
        ).otherwise(F.lit("")),
    )
    text = F.trim(F.array_join(between, ""))
    total = F.length(page).cast("double")
    return F.when(total == 0, F.lit(0.0)).otherwise(F.length(text).cast("double") / total)


def engine_signal_columns(page: Column) -> dict[str, Column]:
    lower = F.lower(page)
    return {
        "has_react": _contains_any(lower, _REACT),
        "has_vue": _contains_any(lower, _VUE),
        "has_angular": _contains_any(lower, _ANGULAR),
        "has_spa_markers": _contains_any(lower, _SPA),
        "has_anti_scraping": _contains_any(lower, _ANTI_SCRAPING),
        "content_ratio": F.round(content_ratio_column(page), 6).cast("double"),
    }


def engine_decision_column(signals: dict[str, Column], probe_first_spa: bool = True) -> Column:
    """Priority order (engine_selection.rs:285-313): anti-scraping →
    headless; frameworks/SPA → wasm-probe-first (or headless); low content
    ratio → likewise; else wasm."""
    framework = (
        signals["has_react"]
        | signals["has_vue"]
        | signals["has_angular"]
        | signals["has_spa_markers"]
    )
    spa_choice = F.lit("wasm" if probe_first_spa else "headless")
    return (
        F.when(signals["has_anti_scraping"], F.lit("headless"))
        .when(framework, spa_choice)
        .when(signals["content_ratio"] < 0.1, spa_choice)
        .otherwise(F.lit("wasm"))
    )


def with_engine_selection(
    df: DataFrame, html_col: str = "html", probe_first_spa: bool = True
) -> DataFrame:
    page = F.decode(F.col(html_col), "UTF-8")
    signals = engine_signal_columns(page)
    df = df.withColumns(signals)
    return df.withColumn(
        "engine",
        engine_decision_column({k: F.col(k) for k in signals}, probe_first_spa),
    )


def with_cached_engine(df: DataFrame, domain_cache: DataFrame, url_col: str = "url") -> DataFrame:
    """Domain warm-start: broadcast-join a small (host, cached_engine) table;
    rows with a cache hit skip analysis (engine_selection.rs:239-244)."""
    host = F.lower(F.coalesce(F.parse_url(F.col(url_col), F.lit("HOST")), F.lit("")))
    df = df.withColumn("host", host)
    joined = df.join(F.broadcast(domain_cache), "host", "left")
    analyzed = with_engine_selection(joined)
    return analyzed.withColumn(
        "engine", F.coalesce(F.col("cached_engine"), F.col("engine"))
    ).drop("cached_engine")
