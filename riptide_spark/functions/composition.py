"""Strategy composition (§2.11): Chain / Parallel / Fallback / Best.

Port of the reference's strategy-composition framework
(``/root/reference/crates/riptide-extraction/src/composition.rs``):

* **Chain** (``composition.rs:436-485``): strategies in order; the first
  whose confidence ≥ ``min_confidence`` wins; all fail → error.
* **Parallel** (``:488-540``): run every strategy, merge the successes
  with a ``ResultMerger`` (Union or BestContent below).
* **Fallback** (``:543-613``): primary if it clears the threshold, else
  secondary unconditionally; requires ≥ 2 strategies.
* **Best** (``:616-679``): run every strategy, keep the highest-confidence
  result (Rust ``max_by`` keeps the *last* of tied maxima — replicated).
* **UnionMerger** (``:82-188``): confidence-filter (MergerConfig default
  0.5), title from the first survivor, contents joined ``"\\n"`` + trim,
  summaries joined ``" "``, confidence = mean, strategy "union_merger".
* **BestContentMerger** (``:191-283``): longest non-empty title (else
  "Untitled"), content = longest (``prefer_longer_content``) or
  highest-confidence, longest summary, strategy "best_content_merger".

Deliberate deviations: no per-strategy wall-clock timeouts
(``timeout_ms``) — data-dependent timeouts make retried Spark tasks
nondeterministic; "Parallel" runs strategies sequentially *within* a row
because the engine's parallelism is across rows (executor tasks), which is
where a 1000-executor cluster actually spends its cores.

Per-document pure functions; a composed strategy is just another callable
for the extraction UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

CHAIN = "chain"
PARALLEL = "parallel"
FALLBACK = "fallback"
BEST = "best"


class CompositionError(ValueError):
    pass


@dataclass
class StrategyResult:
    """ExtractedContent slim form (riptide-types/src/extracted.rs:35-48)."""

    title: str
    content: str
    url: str
    strategy_used: str
    confidence: float
    summary: str | None = None


@dataclass
class MergerConfig:
    """composition.rs:60-80 defaults."""

    min_confidence: float = 0.5
    max_results: int = 5
    weight_by_confidence: bool = True
    prefer_longer_content: bool = True


@dataclass
class CompositionResult:
    result: StrategyResult
    mode: str
    strategies_executed: int
    strategies_succeeded: int


def union_merge(results: list[StrategyResult], config: MergerConfig | None = None) -> StrategyResult:
    """UnionMerger.merge (composition.rs:100-188)."""
    config = config or MergerConfig()
    if not results:
        raise CompositionError("No results to merge")
    filtered = [r for r in results if r.confidence >= config.min_confidence]
    if not filtered:
        raise CompositionError("No results meet confidence threshold")
    combined_content = []
    combined_summary = []
    for r in filtered:
        combined_content.append(r.content)
        if r.summary:
            combined_summary.append(r.summary)
    return StrategyResult(
        title=filtered[0].title,
        content="\n".join(combined_content).strip(),
        summary=" ".join(combined_summary).strip() or None,
        url=filtered[0].url,
        strategy_used="union_merger",
        confidence=sum(r.confidence for r in filtered) / len(filtered),
    )


def best_content_merge(
    results: list[StrategyResult], config: MergerConfig | None = None
) -> StrategyResult:
    """BestContentMerger.merge (composition.rs:209-283)."""
    config = config or MergerConfig()
    if not results:
        raise CompositionError("No results to merge")
    filtered = [r for r in results if r.confidence >= config.min_confidence]
    if not filtered:
        raise CompositionError("No results meet confidence threshold")
    # Rust max_by_key keeps the LAST of tied maxima (composition.rs:225-258);
    # Python max() keeps the first, so use the last-tie helper throughout.
    titles = [r.title for r in filtered if r.title]
    best_title = _last_max(titles, len) if titles else "Untitled"
    if config.prefer_longer_content:
        best = _last_max(filtered, lambda r: len(r.content))
    else:
        best = _max_by_confidence(filtered)
    summaries = [r.summary for r in filtered if r.summary]
    return StrategyResult(
        title=best_title,
        content=best.content,
        summary=_last_max(summaries, len) if summaries else None,
        url=best.url,
        strategy_used="best_content_merger",
        confidence=best.confidence,
    )


def _last_max(items, key):
    """Rust ``max_by_key`` tie rule: the last of equal maxima wins."""
    best = items[0]
    best_k = key(best)
    for item in items[1:]:
        k = key(item)
        if k >= best_k:
            best, best_k = item, k
    return best


def _max_by_confidence(results: list[StrategyResult]) -> StrategyResult:
    """Rust ``max_by`` keeps the LAST of tied maxima; Python ``max`` keeps
    the first — iterate with >= to replicate."""
    best = results[0]
    for r in results[1:]:
        if r.confidence >= best.confidence:
            best = r
    return best


def compose(
    strategies: list,
    html: str,
    url: str,
    mode: str = CHAIN,
    min_confidence: float = 0.6,  # ComposerConfig::default (composition.rs:317)
    merger=union_merge,
) -> CompositionResult:
    """StrategyComposer.execute (composition.rs:409-434).

    ``strategies`` is a list of callables ``(html, url) -> StrategyResult``
    (raising on failure). Returns :class:`CompositionResult`; raises
    :class:`CompositionError` when the mode cannot produce a result.
    """
    if not strategies:
        raise CompositionError("No strategies configured")

    if mode == CHAIN:
        last_error: Exception | None = None
        for executed, strategy in enumerate(strategies, start=1):
            try:
                result = strategy(html, url)
            except Exception as exc:
                last_error = exc
                continue
            if result.confidence >= min_confidence:
                return CompositionResult(result, CHAIN, executed, 1)
            last_error = CompositionError(
                f"Confidence {result.confidence} below threshold"
            )
        raise CompositionError(str(last_error) if last_error else "All strategies failed")

    if mode == FALLBACK:
        if len(strategies) < 2:
            raise CompositionError("Fallback mode requires at least 2 strategies")
        try:
            primary = strategies[0](html, url)
            if primary.confidence >= min_confidence:
                return CompositionResult(primary, FALLBACK, 1, 1)
        except Exception:
            pass
        # Secondary is accepted unconditionally (composition.rs:589-613);
        # its failure surfaces as the documented CompositionError contract
        # (the reference's Err path in execute_fallback), not a raw exception.
        try:
            secondary = strategies[1](html, url)
        except Exception as exc:
            raise CompositionError(f"Fallback strategy failed: {exc}") from exc
        return CompositionResult(secondary, FALLBACK, 2, 1)

    if mode in (PARALLEL, BEST):
        results: list[StrategyResult] = []
        for strategy in strategies:
            try:
                results.append(strategy(html, url))
            except Exception:
                continue
        if not results:
            raise CompositionError(
                "All parallel strategies failed" if mode == PARALLEL else "All strategies failed"
            )
        if mode == PARALLEL:
            merged = merger(results)
            return CompositionResult(merged, PARALLEL, len(strategies), len(results))
        best = _max_by_confidence(results)
        # Reference quirk: Best mode reports strategies_succeeded as the
        # count of *completed* strategies (strategy_times.len(),
        # composition.rs:668) — failures included — not just successes.
        return CompositionResult(best, BEST, len(strategies), len(strategies))

    raise CompositionError(f"Unknown composition mode: {mode}")


# ---------------------------------------------------------------------------
# Built-in strategies over this engine's own extractors — the analog of the
# reference's trek/css/dom strategy plugins (strategies/mod.rs:56-120).
# Confidence = quality_score / 100, like ParserMetadata.confidence_score
# (native_parser/parser.rs:160).
# ---------------------------------------------------------------------------


def article_strategy(html: str, url: str) -> StrategyResult:
    from .extract import extract_document

    doc = extract_document(html, url, "article")
    return StrategyResult(
        title=doc["title"] or "",
        content=doc["text"],
        url=url,
        strategy_used="article",
        confidence=(doc["quality_score"] or 0) / 100.0,
    )


def dom_strategy(html: str, url: str) -> StrategyResult:
    from .native_extract import extract_native

    native = extract_native(html, url)
    return StrategyResult(
        title=native.title or "",
        content=native.text,
        url=url,
        strategy_used="dom",
        confidence=native.quality_score / 100.0,
    )


def css_strategy(selectors: list[str]):
    def run(html: str, url: str) -> StrategyResult:
        from .extract import extract_document

        doc = extract_document(html, url, "custom", selectors)
        return StrategyResult(
            title=doc["title"] or "",
            content=doc["text"],
            url=url,
            strategy_used="css",
            confidence=(doc["quality_score"] or 0) / 100.0,
        )

    return run


__all__ = [
    "CHAIN", "PARALLEL", "FALLBACK", "BEST",
    "CompositionError", "CompositionResult", "MergerConfig", "StrategyResult",
    "compose", "union_merge", "best_content_merge",
    "article_strategy", "dom_strategy", "css_strategy",
]
