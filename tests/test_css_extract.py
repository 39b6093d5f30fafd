"""CSS field extraction + the 14 content transformers (§2.8).

Transformer vectors mirror css_extraction.rs semantics; the Spark operator
test exercises the map-output UDF and merge policies end-to-end."""

from __future__ import annotations

import json

import pytest

from riptide_spark.functions.css_extract import (
    FieldConfig,
    HasTextFilter,
    TransformFailed,
    extract_fields,
    merge_results,
    t_currency,
    t_date_iso,
    t_html_decode,
    t_join,
    t_json_parse,
    t_lowercase,
    t_normalize_ws,
    t_number,
    t_regex_extract,
    t_regex_replace,
    t_split,
    t_trim,
    t_uppercase,
    t_url_abs,
)

HTML = """
<html><body>
  <h1 class="title">  Product   Alpha  </h1>
  <div class="price">Price: $1,299.99 only</div>
  <meta name="published" content="12/31/2024">
  <span class="sku">SKU-42</span>
  <ul><li class="feat">Fast</li><li class="feat">cheap</li><li class="feat">Good value</li></ul>
  <a class="more" href="/details">More &amp; info</a>
</body></html>
"""


def test_transformers_reference_vectors():
    assert t_trim("  x  ") == "x"
    assert t_normalize_ws("  a \t b\n\nc ") == "a b c"
    assert t_number("about 12.5e3 units") == "12.5e3"
    with pytest.raises(TransformFailed):
        t_number("no digits")
    assert t_currency("Price: $1,299.99 only") == "1.299.99"
    assert t_currency("€ 42") == "42"
    assert t_date_iso("2024-03-15") == "2024-03-15"
    assert t_date_iso("published 12/31/2024 ok") == "2024-12-31"
    assert t_date_iso("31.12.2024") == "2024-12-31"
    assert t_url_abs("/x", "https://a.com/b/c") == "https://a.com/x"
    assert t_lowercase("AbC") == "abc"
    assert t_uppercase("AbC") == "ABC"
    assert t_split("a, b ,c") == json.dumps(["a", "b", "c"])
    assert t_join('["a","b"]') == "a, b"
    assert t_join("a; b\nc") == "a, b, c"
    assert t_regex_extract("mail me at u@ex.org please") == "u@ex.org"
    assert t_regex_replace("<b>bold</b>   text") == "bold text"
    assert json.loads(t_json_parse(' {"a": 1} ')) == {"a": 1}
    assert t_html_decode("&amp;&lt;&gt;&copy;&#65;") == "&<>©A"


def test_extract_fields_with_fallbacks_and_transformers():
    fields = {
        "title": FieldConfig(selector=".missing", fallbacks=[".title"], transformers=["normalize_ws"]),
        "price": FieldConfig(selector=".price", transformers=["currency"]),
        "published": FieldConfig(selector="meta[name='published']", transformers=["date_iso"]),
        "link": FieldConfig(selector="a.more[href]"),
    }
    got = extract_fields(HTML, "https://shop.example.com/p/1", fields)
    assert got["title"] == ["Product Alpha"]
    assert got["price"] == ["1.299.99"]
    # meta content attribute wins over inner text (css_extraction.rs:265-268)
    assert got["published"] == ["2024-12-31"]
    assert got["link"] == ["More & info"]


def test_has_text_filter():
    fields = {
        "feat": FieldConfig(selector=".feat", has_text=HasTextFilter(pattern="good")),
    }
    got = extract_fields(HTML, "https://x.example/", fields)
    assert got["feat"] == ["Good value"]
    # inline :has-text() syntax
    fields = {"feat": FieldConfig(selector=".feat:has-text('fast')")}
    got = extract_fields(HTML, "https://x.example/", fields)
    assert got["feat"] == ["Fast"]


def test_transformer_failure_drops_value():
    # currency's symbol is optional, so it happily pulls "42" out of a SKU…
    fields = {"sku_num": FieldConfig(selector=".sku", transformers=["currency"])}
    got = extract_fields(HTML, "https://x.example/", fields)
    assert got["sku_num"] == ["42"]
    # …but a digit-free value is rejected and dropped.
    fields = {"n": FieldConfig(selector=".feat", transformers=["number"])}
    got = extract_fields(HTML, "https://x.example/", fields)
    assert got["n"] == []


def test_merge_policies_and_audit():
    css = {"a": ["1"], "b": ["css"], "c": ["only-css"]}
    other = {"a": ["1"], "b": ["other"], "d": ["only-other"]}
    merged, conflicts = merge_results(css, other, {"b": "OtherWins"})
    assert merged == {"a": ["1"], "b": ["other"], "c": ["only-css"], "d": ["only-other"]}
    assert len(conflicts) == 1
    assert conflicts[0]["field"] == "b"
    assert conflicts[0]["resolution"] == "Other wins"

    merged, _ = merge_results({"b": ["x"]}, {"b": ["y"]}, default_policy="Merge")
    assert merged["b"] == ["x", "y"]


def test_css_udf_spark(spark):
    from riptide_spark.operators.css_udf import merge_extractions_udf, with_css_fields

    fields = {
        "title": FieldConfig(selector=".title", transformers=["normalize_ws"]),
        "price": FieldConfig(selector=".price", transformers=["currency"]),
    }
    df = spark.createDataFrame(
        [("https://shop.example.com/p/1", HTML.encode())], "url string, html binary"
    )
    out = with_css_fields(df, fields).collect()[0]
    assert out["css_fields"]["title"] == ["Product Alpha"]
    assert out["css_fields"]["price"] == ["1.299.99"]

    from pyspark.sql import functions as F

    merged = (
        with_css_fields(df, fields)
        .withColumn(
            "other",
            F.create_map(F.lit("title"), F.array(F.lit("Other Title"))),
        )
        .withColumn("m", merge_extractions_udf()(F.col("css_fields"), F.col("other")))
        .select("m.*")
        .collect()[0]
    )
    assert merged["merged"]["title"] == ["Product Alpha"]  # CssWins default
    assert merged["conflicts"][0]["field"] == "title"


def test_attribute_value_with_colon_not_mangled():
    """Regression: pseudo-class stripping must not eat ':title' inside a
    quoted attribute selector (og:title / twitter:title)."""
    from riptide_spark.functions.css_extract import (
        FieldConfig,
        _clean_selector,
        extract_fields,
    )

    assert _clean_selector("meta[property='og:title']")[0] == "meta[property='og:title']"
    html = (
        "<html><head><meta property='og:title' content='OG T'>"
        "<meta name='twitter:title' content='TW T'></head><body></body></html>"
    )
    out = extract_fields(
        html,
        "https://x/",
        {
            "og": FieldConfig(selector="meta[property='og:title']"),
            "tw": FieldConfig(selector="meta[name='twitter:title']"),
        },
    )
    assert out == {"og": ["OG T"], "tw": ["TW T"]}
