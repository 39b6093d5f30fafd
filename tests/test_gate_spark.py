"""Native-Spark gate vs pure-Python oracle: row-for-row agreement.

The production gate is whole-stage-codegen column arithmetic
(``operators/gate_cols.py``); the oracle is the byte-pinned Python port
(``functions/gate.py``). They must agree on features, score (to f32-grade
tolerance) and the routing decision across the synthetic corpus.
"""

from __future__ import annotations

import pytest

from riptide_spark.functions import gate as pygate
from riptide_spark.operators.gate_cols import with_gate
from riptide_spark.schema import PAGES_SCHEMA
from riptide_spark.sources.pages import synth_pages

N = 150


@pytest.fixture(scope="module")
def gated_rows(spark):
    rows = synth_pages(N, seed=7)
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        PAGES_SCHEMA,
    )
    collected = with_gate(df).select(
        "url",
        "html",
        "html_bytes",
        "visible_text_chars",
        "p_count",
        "article_count",
        "h1h2_count",
        "script_bytes",
        "has_og",
        "has_jsonld_article",
        "spa_markers",
        "domain_prior",
        "gate_score",
        "content_mode",
    ).collect()
    assert len(collected) == N
    return collected


def test_gate_features_match_oracle(gated_rows):
    for row in gated_rows:
        html = bytes(row["html"]).decode("utf-8", errors="replace")
        feats = pygate.analyze_content(html, row["url"])
        assert row["html_bytes"] == feats.html_bytes, row["url"]
        assert row["p_count"] == feats.p_count, row["url"]
        assert row["article_count"] == feats.article_count, row["url"]
        assert row["h1h2_count"] == feats.h1h2_count, row["url"]
        assert row["has_og"] == feats.has_og, row["url"]
        assert row["has_jsonld_article"] == feats.has_jsonld_article, row["url"]
        assert row["script_bytes"] == feats.script_bytes, row["url"]
        assert row["spa_markers"] == feats.spa_markers, row["url"]
        assert row["domain_prior"] == pytest.approx(feats.domain_prior), row["url"]
        assert row["visible_text_chars"] == feats.visible_text_chars, row["url"]


def test_gate_score_and_decision_match_oracle(gated_rows):
    for row in gated_rows:
        html = bytes(row["html"]).decode("utf-8", errors="replace")
        feats = pygate.analyze_content(html, row["url"])
        expected_score = pygate.score(feats)
        assert row["gate_score"] == pytest.approx(expected_score, abs=1e-9), row["url"]
        expected_mode = pygate.route(html, row["url"])
        assert row["content_mode"] == expected_mode, row["url"]


def test_gate_stays_jvm_side(spark, gated_rows):
    """The routing plan must contain no Python evaluation (UDF-free)."""
    rows = synth_pages(10, seed=9)
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        PAGES_SCHEMA,
    )
    plan = with_gate(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
