"""Engine-selection v2 signals (P9) + topic keywords (A6) + skip mode (P10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riptide_spark.functions.chunking import extract_topic_keywords
from riptide_spark.operators.engine_cols import with_cached_engine, with_engine_selection


def _one(spark, html: str):
    df = spark.createDataFrame([("https://x.example/", html.encode())], "url string, html binary")
    return with_engine_selection(df).collect()[0]


def test_anti_scraping_forces_headless(spark):
    row = _one(spark, "<html><body>cf-browser-verification challenge</body></html>")
    assert row["has_anti_scraping"] is True
    assert row["engine"] == "headless"


def test_framework_detection_probe_first(spark):
    row = _one(spark, '<html><body><div data-reactroot></div>' + "text " * 100 + "</body></html>")
    assert row["has_react"] is True
    assert row["engine"] == "wasm"  # probe-first: try fast path, escalate on weak probe
    df = spark.createDataFrame(
        [("https://x.example/", b"<html><body><div data-reactroot></div></body></html>")],
        "url string, html binary",
    )
    conservative = with_engine_selection(df, probe_first_spa=False).collect()[0]
    assert conservative["engine"] == "headless"


def test_content_ratio(spark):
    # Mostly markup → low ratio.
    markup = "<html><body>" + "<div></div>" * 200 + "<p>x</p></body></html>"
    row = _one(spark, markup)
    assert row["content_ratio"] < 0.1
    texty = "<html><body><p>" + "visible words here " * 200 + "</p></body></html>"
    row = _one(spark, texty)
    assert row["content_ratio"] > 0.5


def test_vue_angular_detection(spark):
    assert _one(spark, "<html><body><div v-app></div></body></html>")["has_vue"] is True
    assert _one(spark, "<html><body ng-app='m'></body></html>")["has_angular"] is True


def test_domain_cache_broadcast_join(spark):
    pages = spark.createDataFrame(
        [
            ("https://cached.example.com/a", b"<html><body>plain</body></html>"),
            ("https://fresh.example.com/b", b"<html><body>cf-browser-verification</body></html>"),
        ],
        "url string, html binary",
    )
    cache = spark.createDataFrame(
        [("cached.example.com", "headless")], "host string, cached_engine string"
    )
    rows = {r["url"]: r["engine"] for r in with_cached_engine(pages, cache).collect()}
    assert rows["https://cached.example.com/a"] == "headless"  # cache hit wins
    assert rows["https://fresh.example.com/b"] == "headless"  # analyzed


def test_engine_signals_jvm_side(spark):
    df = spark.createDataFrame([("u", b"<html></html>")], "url string, html binary")
    plan = with_engine_selection(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_topic_keywords():
    text = (
        "Spark spark SPARK! engine engine pipeline. the and with from "
        "tiny ok throughput throughput throughput (parquet) [parquet]"
    )
    got = extract_topic_keywords(text)
    # throughput×3, spark×3 (case-folded, edges stripped), engine×2,
    # parquet×2, pipeline×1; ties break alphabetically.
    assert got == ["spark", "throughput", "engine", "parquet", "pipeline"]
    assert extract_topic_keywords("the and with from tiny") == ["tiny"]
    assert extract_topic_keywords("all low ok") == []  # ≤3 chars filtered


def test_skip_extraction_passthrough(spark):
    from riptide_spark.operators.extract_udf import extract_udf

    html = "<html><body><p>raw &amp; untouched</p></body></html>"
    df = spark.createDataFrame([("https://x.example/", html.encode(), "skip")],
                               "url string, html binary, mode string")
    row = df.select(extract_udf(F.col("html"), F.col("url"), F.col("mode")).alias("ex")) \
            .select("ex.*").collect()[0]
    assert row["error"] is None
    assert row["extracted_text"] == html  # verbatim, entities untouched
    assert row["title"] is None
