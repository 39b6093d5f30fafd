"""Schema learning/extraction/validation tests (E22).

Mirrors inline tests in ``schema/generator.rs:396-469`` and
``schema/extractor.rs`` plus the validator harness semantics.
"""

from __future__ import annotations

from riptide_spark.functions.schema_learn import (
    ExtractionSchema,
    FieldSchema,
    SelectorRule,
    extract_with_schema,
    learn_schema,
)
from riptide_spark.functions.schema_learn import test_extraction as run_test_extraction
from riptide_spark.functions.schema_learn import test_schema as run_test_schema

ARTICLE_HTML = """
<html>
    <head><title>Test Article</title></head>
    <body>
        <article>
            <h1>Article Title</h1>
            <div class="author">John Doe</div>
            <time datetime="2024-01-01">January 1, 2024</time>
            <div class="article-content">Article content here</div>
        </article>
    </body>
</html>
"""

PRODUCT_HTML = """
<html>
    <body>
        <div class="product">
            <h1 class="product-name">Product Name</h1>
            <span class="price">$19.99</span>
            <div class="product-description">Description here</div>
        </div>
    </body>
</html>
"""


def test_learn_article_schema():
    # generator.rs:406-438
    schema, analysis, _ = learn_schema(
        ARTICLE_HTML, "http://example.com", "article", confidence_threshold=0.7
    )
    assert len(schema.fields) >= 2  # at least title and content
    assert analysis.confidence > 0.0
    assert analysis.patterns_found == ["article"]


def test_learn_product_schema():
    # generator.rs:440-469
    schema, _, _ = learn_schema(
        PRODUCT_HTML, "http://example.com", "product", confidence_threshold=0.7
    )
    assert "name" in schema.fields
    assert "price" in schema.fields


def test_confidence_threshold_filters_rules_and_fields():
    # generator.rs:319-336 — at 0.95 only the highest-confidence rules
    # survive; fields whose rules all drop are removed entirely.
    schema, analysis, _ = learn_schema(
        ARTICLE_HTML, "http://example.com", "article", confidence_threshold=0.95
    )
    kept = {f: [r.selector for r in rules] for f, rules in schema.selectors.items()}
    assert kept == {
        "title": ["article h1"],
        "published_date": ["time[datetime]"],
    }
    assert set(schema.fields) == set(kept)
    assert analysis.selectors_generated == 2


def test_requested_fields_name_convention():
    # generator.rs:267-296
    schema, _, _ = learn_schema(
        ARTICLE_HTML, "http://example.com", "article",
        confidence_threshold=0.7, fields=["byline"],
    )
    assert [r.selector for r in schema.selectors["byline"]] == [
        ".byline", "[name='byline']", "#byline",
    ]


def test_suggestions_rules():
    # generator.rs:364-393 — single-selector field and few-fields messages.
    schema, _, suggestions = learn_schema(
        "<html><body><p>x</p></body></html>", "http://e.com", "listing"
    )
    assert "Schema has few fields, consider adding more specific selectors" in suggestions
    assert any("has only one selector" not in s or "items" in s for s in suggestions)


def test_extract_with_schema_priority_order():
    schema, _, _ = learn_schema(ARTICLE_HTML, "http://example.com", "article")
    out = extract_with_schema(schema, ARTICLE_HTML, "http://example.com")
    # h1 (priority 10) beats article h1 (9) — same node here; author via .author.
    assert out["title"] == "Article Title"
    assert out["author"] == "John Doe"
    assert out["published_date"] == "January 1, 2024"
    assert "Article content here" in out["content"]


def test_extract_meta_selector_reads_content_attr():
    html = (
        "<html><head><meta property='og:title' content='Meta Title'>"
        "</head><body><p>hello world paragraph</p></body></html>"
    )
    schema = ExtractionSchema("s", "1.0.0", "custom")
    schema.add_field("title", FieldSchema(required=True))
    schema.add_selector("title", SelectorRule("meta[property='og:title']", 10, 0.9))
    out = extract_with_schema(schema, html, "http://e.com")
    assert out["title"] == "Meta Title"


def test_fallback_selector_and_default():
    # extractor.rs:52-66 fallback; extractor.rs:28-32 default.
    html = "<html><body><div class='alt'>Fallback Value</div></body></html>"
    schema = ExtractionSchema("s", "1.0.0", "custom")
    schema.add_field("a", FieldSchema())
    schema.add_selector("a", SelectorRule(".primary", 10, 0.9, fallback=".alt"))
    schema.add_field("b", FieldSchema(default="the-default"))
    schema.add_selector("b", SelectorRule(".missing", 10, 0.9))
    out = extract_with_schema(schema, html, "http://e.com")
    assert out["a"] == "Fallback Value"
    assert out["b"] == "the-default"


def test_test_extraction_required_and_validation():
    schema, _, _ = learn_schema(ARTICLE_HTML, "http://example.com", "article")
    result = run_test_extraction(schema, ARTICLE_HTML, "http://example.com")
    assert result.success
    assert result.confidence == 1.0  # all 4 fields extracted

    empty = "<html><body><span>nothing relevant</span></body></html>"
    result2 = run_test_extraction(schema, empty, "http://example.com/2")
    assert not result2.success
    assert "title" in result2.missing_fields
    assert "content" in result2.missing_fields

    schema.validation = {"min_fields": 10}
    result3 = run_test_extraction(schema, ARTICLE_HTML, "http://example.com")
    assert not result3.success
    assert result3.errors == ["Expected at least 10 fields, got 4"]
    schema.validation = None


def test_schema_harness_over_corpus_pages():
    # validator.rs:19-84 over real synthesized pages.
    from riptide_spark.sources.pages import synth_pages

    pages = synth_pages(120, seed=42)
    articles = [
        (p["url"], p["html"].decode("utf-8", errors="replace"))
        for p in pages
        if p["archetype"] in ("news_article", "blog_post")
    ]
    assert len(articles) >= 30
    schema, _, _ = learn_schema(articles[0][1], articles[0][0], "article")
    report = run_test_schema(schema, articles)
    assert report["total_tests"] == len(articles)
    assert report["passed"] + report["failed"] == report["total_tests"]
    # Articles in the corpus carry h1 + article content: high success.
    assert report["success_rate"] >= 0.9
    assert 0.0 <= report["avg_confidence"] <= 1.0

    # fail_fast stops at the first failure.
    mixed = [("u1", "<html><body><span>no article</span></body></html>")] + articles
    ff = run_test_schema(schema, mixed, fail_fast=True)
    assert ff["total_tests"] == 1
    assert ff["failed"] == 1
