"""Golden fixture corpus loader: the reference's own fixtures + snapshots.

Cases mirror ``/root/reference/wasm/riptide-extractor-wasm/tests/golden/mod.rs:75-146``.
The HTML fixtures and expected snapshots are read from the read-only
reference checkout at runtime (data, not code); the north rule requires
exact ``==`` on every field (stricter than the reference's 0.95
text-similarity gate, per FIXTURES.md §6). ``tests/test_golden.py`` pins
every field; the driver-visible ``extract_golden_fixtures`` query
surfaces the same byte-identity as an oracled CORRECTNESS row
(VERDICT r3 next-round #3).
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

# The reference checkout root is overridable so hosts with the checkout
# elsewhere still surface the golden query/oracle pair instead of it
# silently dropping out of the driver correctness surface (ADVICE r4 #5).
REFERENCE_ROOT = Path(os.environ.get("RIPTIDE_REFERENCE_ROOT", "/root/reference"))
REFERENCE_WASM = REFERENCE_ROOT / "wasm" / "riptide-extractor-wasm"
FIXTURES_DIR = REFERENCE_WASM / "tests" / "fixtures"
SNAPSHOTS_DIR = REFERENCE_WASM / "tests" / "golden" / "snapshots"

GOLDEN_CASES = [
    # (name, fixture_file, url, mode)
    ("news_site_article", "news_site.html", "https://news.example.com/tech/ai-breakthrough-2024", "article"),
    ("news_site_full", "news_site.html", "https://news.example.com/tech/ai-breakthrough-2024", "full"),
    ("blog_post_article", "blog_post.html", "https://devblog.example.com/scalable-web-apps-guide", "article"),
    ("gallery_site_full", "gallery_site.html", "https://photogallery.example.com/collections/tokyo-street-life", "full"),
    ("nav_heavy_metadata", "nav_heavy_site.html", "https://projectflow.example.com/dashboard", "metadata"),
]

# Fixtures without snapshots, still useful as extraction smoke inputs.
EXTRA_FIXTURES = ["ecommerce.html", "edge_cases.html", "news_article.html"]


def load_fixture(filename: str) -> str:
    return (FIXTURES_DIR / filename).read_text(encoding="utf-8")


def load_snapshot(name: str) -> dict:
    raw = (SNAPSHOTS_DIR / f"{name}.json").read_text(encoding="utf-8")
    return json.loads(re.sub(r"^//.*$", "", raw, flags=re.M))


def reference_available() -> bool:
    ok = SNAPSHOTS_DIR.is_dir()
    if not ok:
        import warnings

        warnings.warn(
            f"reference checkout not found at {REFERENCE_ROOT} — the "
            "extract_golden_fixtures query/oracle pair is skipped; set "
            "RIPTIDE_REFERENCE_ROOT to the checkout to restore it",
            stacklevel=2,
        )
    return ok
