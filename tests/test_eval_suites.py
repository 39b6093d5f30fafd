"""Eval-suite analog: per-archetype success-rate gates.

The reference evaluates against live-URL suites with expected success rates
(``eval/README.md:10-40``: >90% static docs, >85% news, >80% product pages,
>75% listings). The sandbox has no network, so the suites become the
synthetic corpus archetypes (``sources/pages.py``), run through the REAL
end-to-end plan (gate → route → Arrow extract), with the same thresholds.

Success = no error, non-empty extracted_text, non-empty title — the
reference counts an eval URL successful when extraction yields content
(``eval/README.md``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# archetype → (reference suite analog, min success rate)
SUITE_THRESHOLDS = {
    "blog_post": ("00_static_docs", 0.90),
    "news_article": ("10_news_articles", 0.85),
    "ecommerce": ("20_product_pages", 0.80),
    "gallery": ("30_listings", 0.75),
    "nav_heavy_app": ("30_listings", 0.75),
    # No reference analog (it would headless-render); the DOM-heuristic
    # path should still extract the shell's noscript/app content.
    "spa_shell": ("spa (dom-path)", 0.50),
    # Vendored classic-PDF parser: ~90% of synthetic PDFs are well-formed
    # (the corrupt rest must become fallback error docs, not successes).
    "pdf_doc": ("pdf (vendored parser)", 0.80),
}

N_PAGES = 1000


@pytest.fixture(scope="module")
def eval_results(spark):
    from riptide_spark.plans.pipeline import ExtractionJobConfig, extraction_plan
    from riptide_spark.sources.pages import synth_pages

    pages = synth_pages(N_PAGES, seed=42)
    meta = spark.createDataFrame(
        [(p["url"], p["archetype"]) for p in pages], "url string, archetype string"
    )
    pdf = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in pages],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    res = extraction_plan(pdf, ExtractionJobConfig(output_path="", resume=False))
    rows = (
        res.join(meta, "url")
        .groupBy("archetype")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("error").isNull()
                    & (F.length("extracted_text") > 0)
                    & (F.length("title") > 0),
                    1,
                ).otherwise(0)
            ).alias("ok"),
        )
        .collect()
    )
    return {r["archetype"]: (r["n"], r["ok"]) for r in rows}


@pytest.mark.parametrize("archetype", sorted(SUITE_THRESHOLDS))
def test_suite_success_rate(eval_results, archetype):
    suite, threshold = SUITE_THRESHOLDS[archetype]
    n, ok = eval_results[archetype]
    assert n > 0, f"corpus generated no {archetype} pages"
    rate = ok / n
    assert rate >= threshold, (
        f"{suite} ({archetype}): success {ok}/{n} = {rate:.3f} < {threshold}"
    )


def test_invalid_pages_rejected_not_dropped(eval_results):
    # minimal_invalid rows must flow through as error rows (error-column
    # isolation), not vanish — at 10^12 rows a silently dropped partition
    # is indistinguishable from "all invalid" without this.
    n, ok = eval_results["minimal_invalid"]
    assert n > 0
    assert ok == 0


def test_all_archetypes_accounted(eval_results):
    total = sum(n for n, _ in eval_results.values())
    assert total == N_PAGES
