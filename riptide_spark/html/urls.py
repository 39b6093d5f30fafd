"""URL resolution with semantics pinned to the reference's ``url`` crate use.

The reference resolves every link/media href against the page URL via
``url::Url::join`` (``/root/reference/wasm/riptide-extractor-wasm/src/extraction.rs:34``).
Python's ``urljoin`` differs in one observable way exercised by the golden
snapshots: ``join("#")`` keeps the trailing ``#`` in the url crate
(``https://…/ai-breakthrough-2024#`` in ``news_site_article.json:23-25``)
while ``urljoin`` drops it. ``resolve_url`` papers over that.
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import urljoin, urlsplit

MAX_URL_LEN = 2048  # common_validation.rs:34


def parse_ok(url: str) -> bool:
    """True iff the URL parses with scheme http/https and a host.

    Mirrors ``validate_url_format``
    (``wasm/riptide-extractor-wasm/src/common_validation.rs:32-49``):
    length ≤ 2048, absolute, scheme ∈ {http, https}.
    """
    if not url or len(url) > MAX_URL_LEN:
        return False
    try:
        parts = urlsplit(url)
    except ValueError:
        return False
    return parts.scheme in ("http", "https") and bool(parts.netloc)


_CACHE_INPUT_LIMIT = 1024  # don't let multi-KB tracking URLs bloat the cache


def resolve_url(base: str, href: str) -> str | None:
    """RFC-3986 join of ``href`` against ``base``; None if it cannot resolve.

    Memoized per executor Python worker: pure function of (base, href), and
    nav/footer/media hrefs repeat across every page of a host, so the cache
    absorbs most urljoin/urlsplit work in the hot UDF path. Inputs over
    1 KB bypass the cache — without the bypass, 64k entries of multi-KB
    redirect/tracking URLs (common in crawl data) could hold hundreds of
    MB per reused Python worker. With it: ≤ ~190 MB worst case
    (64k × 3 × 1 KB), ~tens of MB realistically (typical URLs < 100 B).
    """
    if len(base) + len(href) > _CACHE_INPUT_LIMIT:
        return _resolve_url_impl(base, href)
    return _resolve_url_cached(base, href)


@lru_cache(maxsize=65536)
def _resolve_url_cached(base: str, href: str) -> str | None:
    return _resolve_url_impl(base, href)


def _resolve_url_impl(base: str, href: str) -> str | None:
    """The actual join.

    Pinned to url-crate behavior on the golden corpus: a reference that is
    (or ends in) a bare ``#`` keeps its empty fragment in the output.
    """
    try:
        joined = urljoin(base, href)
    except ValueError:
        return None
    if "#" in href and "#" not in joined:
        joined += "#"
    try:
        parts = urlsplit(joined)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https") or not parts.netloc:
        return None
    # The url crate serializes an authority-only URL with a "/" path.
    if parts.path == "" and "#" not in joined and "?" not in joined:
        joined += "/"
    return joined


def host_of(url: str) -> str | None:
    try:
        host = urlsplit(url).hostname
    except ValueError:
        return None
    return host or None
