"""Strategy composition tests (§2.11, composition.rs semantics)."""

from __future__ import annotations

import pytest

from riptide_spark.functions.composition import (
    BEST,
    CHAIN,
    FALLBACK,
    PARALLEL,
    CompositionError,
    MergerConfig,
    StrategyResult,
    article_strategy,
    best_content_merge,
    compose,
    css_strategy,
    dom_strategy,
    union_merge,
)


def _s(name, confidence, content="body", title="t", summary=None):
    def run(html, url):
        return StrategyResult(
            title=title, content=content, url=url,
            strategy_used=name, confidence=confidence, summary=summary,
        )

    return run


def _fail(name):
    def run(html, url):
        raise RuntimeError(f"{name} blew up")

    return run


def test_chain_first_confident_wins():
    # composition.rs:436-485 — low-confidence results don't stop the chain.
    out = compose([_s("a", 0.3), _s("b", 0.9), _s("c", 0.95)], "<html>", "u", CHAIN)
    assert out.result.strategy_used == "b"
    assert out.strategies_executed == 2
    assert out.strategies_succeeded == 1


def test_chain_all_fail_raises():
    with pytest.raises(CompositionError):
        compose([_fail("a"), _s("b", 0.1)], "<html>", "u", CHAIN)


def test_fallback_primary_then_secondary():
    # composition.rs:543-613 — secondary accepted unconditionally.
    ok = compose([_s("p", 0.9), _s("s", 0.2)], "<html>", "u", FALLBACK)
    assert ok.result.strategy_used == "p" and ok.strategies_executed == 1
    fb = compose([_s("p", 0.1), _s("s", 0.2)], "<html>", "u", FALLBACK)
    assert fb.result.strategy_used == "s" and fb.strategies_executed == 2
    crash = compose([_fail("p"), _s("s", 0.2)], "<html>", "u", FALLBACK)
    assert crash.result.strategy_used == "s"
    with pytest.raises(CompositionError):
        compose([_s("only", 0.9)], "<html>", "u", FALLBACK)


def test_best_picks_highest_confidence_last_tie():
    out = compose([_s("a", 0.7), _s("b", 0.9), _s("c", 0.9)], "<html>", "u", BEST)
    # Rust max_by keeps the LAST of tied maxima.
    assert out.result.strategy_used == "c"
    assert out.strategies_succeeded == 3
    # Failures are skipped, not fatal, as long as one succeeds.
    out2 = compose([_fail("a"), _s("b", 0.4)], "<html>", "u", BEST)
    assert out2.result.strategy_used == "b"


def test_parallel_union_merge():
    # composition.rs:100-188 — title from first survivor, contents joined
    # "\n", mean confidence; sub-0.5 results filtered by MergerConfig.
    out = compose(
        [
            _s("a", 0.8, content="AAA", title="TA", summary="sa"),
            _s("b", 0.6, content="BBB", title="TB", summary="sb"),
            _s("c", 0.2, content="CCC"),
        ],
        "<html>", "u", PARALLEL,
    )
    r = out.result
    assert r.strategy_used == "union_merger"
    assert r.title == "TA"
    assert r.content == "AAA\nBBB"
    assert r.summary == "sa sb"
    assert abs(r.confidence - 0.7) < 1e-9
    assert out.strategies_succeeded == 3  # succeeded ≠ survived the merge filter


def test_union_merge_threshold_error():
    with pytest.raises(CompositionError):
        union_merge([StrategyResult("t", "c", "u", "x", 0.1)])
    with pytest.raises(CompositionError):
        union_merge([])


def test_best_content_merge_fields():
    # composition.rs:209-283 — longest title, longest content, longest summary.
    merged = best_content_merge(
        [
            StrategyResult("short", "xxxx", "u1", "a", 0.9, summary="s"),
            StrategyResult("much longer title", "xx", "u2", "b", 0.6, summary="longer summary"),
        ]
    )
    assert merged.title == "much longer title"
    assert merged.content == "xxxx"  # prefer_longer_content default
    assert merged.summary == "longer summary"
    assert merged.url == "u1"
    assert merged.strategy_used == "best_content_merger"
    # prefer_longer_content=False → highest confidence wins content.
    merged2 = best_content_merge(
        [
            StrategyResult("t", "long-but-low", "u1", "a", 0.55),
            StrategyResult("t", "hi", "u2", "b", 0.95),
        ],
        MergerConfig(prefer_longer_content=False),
    )
    assert merged2.content == "hi"


def test_best_content_merge_untitled():
    merged = best_content_merge([StrategyResult("", "c", "u", "a", 0.9)])
    assert merged.title == "Untitled"


def test_builtin_strategies_compose_on_real_html():
    html = (
        "<html><head><title>Composed Page</title></head><body><article>"
        + "<p>" + "Plenty of meaningful prose content in this paragraph. " * 30 + "</p>"
        + "</article></body></html>"
    )
    out = compose(
        [article_strategy, dom_strategy, css_strategy(["article p"])],
        html, "https://x.example.com/", BEST,
    )
    assert out.result.content
    assert out.result.confidence > 0.6
    assert out.strategies_succeeded >= 2
    chain = compose([article_strategy, dom_strategy], html, "https://x.example.com/", CHAIN)
    assert chain.result.strategy_used == "article"


def test_unknown_mode_raises():
    with pytest.raises(CompositionError):
        compose([_s("a", 0.9)], "<html>", "u", "bogus")
    with pytest.raises(CompositionError):
        compose([], "<html>", "u", CHAIN)


def test_best_content_merge_last_tie_rule():
    # composition.rs max_by_key keeps the LAST of tied maxima.
    merged = best_content_merge(
        [
            StrategyResult("Alpha", "XX", "u1", "a", 0.9, summary="s1"),
            StrategyResult("Bravo", "YY", "u2", "b", 0.9, summary="s2"),
        ]
    )
    assert merged.title == "Bravo"
    assert merged.content == "YY"
    assert merged.summary == "s2"


def test_best_mode_counts_completed_strategies():
    # composition.rs:668 quirk: strategies_succeeded = completed (incl.
    # failures), not successes.
    out = compose([_fail("a"), _s("b", 0.4)], "<html>", "u", BEST)
    assert out.strategies_succeeded == 2
