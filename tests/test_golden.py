"""Byte-identical golden parity vs the reference extractor's snapshots.

The reference tolerates 0.95 text similarity
(``tests/golden/mod.rs:226-227``); our north rule demands exact equality on
``text`` per url — and we additionally assert exact equality on *every*
field: title, byline, published_iso, links, media, language, categories,
reading_time, quality_score, word_count, site_name, description.
"""

from __future__ import annotations

import pytest

from riptide_spark.functions.extract import ExtractionInvalid, extract_document

from .golden_cases import (
    EXTRA_FIXTURES,
    GOLDEN_CASES,
    load_fixture,
    load_snapshot,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference golden snapshots not present"
)

FIELDS = [
    "url",
    "title",
    "byline",
    "published_iso",
    "markdown",
    "text",
    "links",
    "media",
    "language",
    "reading_time",
    "quality_score",
    "word_count",
    "categories",
    "site_name",
    "description",
]


@pytest.mark.parametrize("name,fixture,url,mode", GOLDEN_CASES)
def test_golden_byte_identical(name, fixture, url, mode):
    html = load_fixture(fixture)
    expected = load_snapshot(name)
    got = extract_document(html, url, mode)
    for field in FIELDS:
        if field in expected:
            assert got[field] == expected[field], f"{name}.{field} diverges"


@pytest.mark.parametrize("fixture", EXTRA_FIXTURES)
@pytest.mark.parametrize("mode", ["article", "full", "metadata"])
def test_extra_fixtures_extract_without_error(fixture, mode):
    html = load_fixture(fixture)
    got = extract_document(html, "https://example.com/page", mode)
    assert got["url"] == "https://example.com/page"
    assert isinstance(got["text"], str)
    assert 0 <= got["quality_score"] <= 100


def test_extraction_is_deterministic():
    html = load_fixture("news_site.html")
    url = "https://news.example.com/tech/ai-breakthrough-2024"
    first = extract_document(html, url, "article")
    second = extract_document(html, url, "article")
    assert first == second


def test_invalid_inputs_rejected():
    with pytest.raises(ExtractionInvalid):
        extract_document("", "https://example.com")
    with pytest.raises(ExtractionInvalid):
        extract_document("   ", "https://example.com")
    with pytest.raises(ExtractionInvalid):
        extract_document("plain text without html", "https://example.com")
    html = "<html><body><p>hi</p></body></html>"
    with pytest.raises(ExtractionInvalid):
        extract_document(html, "not-a-url")
    with pytest.raises(ExtractionInvalid):
        extract_document(html, "ftp://example.com")
    with pytest.raises(ExtractionInvalid):
        extract_document(html, "https://example.com/" + "x" * 3000)
    with pytest.raises(ExtractionInvalid):
        extract_document(html, "https://example.com", "custom", [])
    with pytest.raises(ExtractionInvalid):
        extract_document(html, "https://example.com", "custom", ["a..b"])
    with pytest.raises(ExtractionInvalid):
        extract_document(html, "https://example.com", "custom", ["> div"])


def test_custom_selector_mode():
    html = (
        "<html><body><div class='a'>First  block</div>"
        "<p>Second</p><div class='a'>Third</div></body></html>"
    )
    got = extract_document(html, "https://example.com/x", "custom", [".a", "p"])
    assert got["text"] == "First  block\n\nThird\n\nSecond"
