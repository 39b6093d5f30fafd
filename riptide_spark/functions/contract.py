"""The WASM Component Model contract surface (§2.11), host-side.

The reference's extensibility interface is the WIT contract
``/root/reference/wasm/riptide-extractor-wasm/wit/extractor.wit:117-145``:
``extract`` / ``extract-with-stats`` / ``validate-html`` / ``health-check``
/ ``get-info`` / ``reset-state`` / ``get-modes``. In this engine the
per-document worker is :func:`riptide_spark.functions.extract.extract_document`
(wrapped by the Arrow UDF); this module exposes the remaining contract
functions so a user of the reference component finds the same API here.

Semantics pinned to ``wasm/riptide-extractor-wasm/src/lib.rs``:

* ``extract_with_stats`` (lib.rs:147-175): stats = processing_time_ms,
  memory_used (tracemalloc delta, the Python analog of the reference's
  allocator estimate), nodes_processed = count of ``<`` in the html
  (lib.rs:626-629), links_found / images_found = output array lengths.
* ``validate_html`` (lib.rs:178-184): True/False, never raises.
* ``health_check`` (lib.rs:187-197): status/version/capabilities/counters.
* ``get_info`` (lib.rs:199-221): feature list replicated verbatim.
* ``reset_state`` (lib.rs:223-244): zero the extraction counter, return the
  same message shape (including the reference's quirk of reading the
  counter *after* storing 0 — the reported previous count is always 0).
* ``get_modes`` (lib.rs:609-616): the four mode description strings.

The extraction counter is per-process (one per executor Python worker),
like the reference's per-WASM-instance atomic.
"""

from __future__ import annotations

import time
import tracemalloc
from dataclasses import dataclass, field

from .extract import (
    ExtractionInvalid,
    extract_document,
    validate_html_structure,
)

COMPONENT_NAME = "riptide-spark-extractor"
COMPONENT_VERSION = "0.1.0"

_SUPPORTED_MODES = [
    "article - Extract article content using readability algorithms",
    "full - Extract full page content including sidebars and navigation",
    "metadata - Extract only metadata (title, description, structured data)",
    "custom - Custom extraction using provided CSS selectors",
]

_FEATURES = [
    "article-extraction",
    "full-page-extraction",
    "metadata-extraction",
    "custom-selectors",
    "tl-based-extraction",
    "links-extraction",
    "media-extraction",
    "language-detection",
    "category-extraction",
    "url-resolution",
]

_extraction_count = 0


@dataclass
class ExtractionStats:
    """extraction-stats record (extractor.wit:104-116)."""

    processing_time_ms: int
    memory_used: int
    nodes_processed: int | None
    links_found: int
    images_found: int


@dataclass
class HealthStatus:
    """health-status record (lib.rs:187-197)."""

    status: str
    version: str
    extractor_version: str
    capabilities: list[str]
    memory_usage: int | None
    extraction_count: int | None


@dataclass
class ComponentInfo:
    """component-info record (lib.rs:199-221)."""

    name: str = COMPONENT_NAME
    version: str = COMPONENT_VERSION
    component_model_version: str = "0.2.0"
    features: list[str] = field(default_factory=lambda: list(_FEATURES))
    supported_modes: list[str] = field(default_factory=lambda: list(_SUPPORTED_MODES))
    build_timestamp: str | None = None
    git_commit: str | None = None


def extract(html: str, url: str, mode: str, selectors: list[str] | None = None) -> dict:
    """The primary WIT export: one document through the pinned extractor."""
    global _extraction_count
    _extraction_count += 1
    return extract_document(html, url, mode, selectors)


def extract_with_stats(
    html: str, url: str, mode: str, selectors: list[str] | None = None
) -> tuple[dict, ExtractionStats]:
    """extract + extraction-stats (lib.rs:147-175)."""
    # Never clobber an ambient tracemalloc session (e.g. a caller profiling
    # the whole app) — only stop tracing we ourselves started.
    started_tracing = not tracemalloc.is_tracing()
    if started_tracing:
        tracemalloc.start()
    start = time.monotonic()
    try:
        content = extract(html, url, mode, selectors)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        if started_tracing:
            tracemalloc.stop()
    stats = ExtractionStats(
        processing_time_ms=int((time.monotonic() - start) * 1000),
        memory_used=peak,
        nodes_processed=html.count("<"),  # lib.rs:626-629
        links_found=len(content["links"]),
        images_found=len(content["media"]),
    )
    return content, stats


def validate_html(html: str) -> bool:
    """validate-html: boolean, never raises (lib.rs:178-184)."""
    try:
        validate_html_structure(html)
        return True
    except ExtractionInvalid:
        return False


def health_check() -> HealthStatus:
    return HealthStatus(
        status="healthy",
        version=COMPONENT_VERSION,
        extractor_version=COMPONENT_VERSION,
        capabilities=list(_SUPPORTED_MODES),
        memory_usage=None,
        extraction_count=_extraction_count,
    )


def get_info() -> ComponentInfo:
    return ComponentInfo()


def reset_state() -> str:
    """reset-state (lib.rs:223-244). The reference stores 0 before reading
    the 'previous' count, so the message always reports 0; replicated."""
    global _extraction_count
    _extraction_count = 0
    old_count = _extraction_count
    return f"Component state reset successfully. Previous extraction count: {old_count}"


def get_modes() -> list[str]:
    return list(_SUPPORTED_MODES)


__all__ = [
    "extract",
    "extract_with_stats",
    "validate_html",
    "health_check",
    "get_info",
    "reset_state",
    "get_modes",
    "ExtractionStats",
    "HealthStatus",
    "ComponentInfo",
]
