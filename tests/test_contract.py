"""WIT component-contract surface tests (§2.11).

Mirrors ``wasm/riptide-extractor-wasm/wit/extractor.wit:117-145`` and the
host implementations in ``src/lib.rs:147-316``.
"""

from __future__ import annotations

from riptide_spark.functions import contract

GOOD = (
    "<html><head><title>Contract Page</title></head><body><article>"
    + "<p>" + "Meaningful prose content here with many words. " * 30 + "</p>"
    + '<a href="https://x.example.com/a">a</a>'
    + '<img src="https://x.example.com/i.jpg">'
    + "</article></body></html>"
)


def test_extract_matches_extract_document():
    from riptide_spark.functions.extract import extract_document

    assert contract.extract(GOOD, "https://e.example.com/", "article") == (
        extract_document(GOOD, "https://e.example.com/", "article")
    )


def test_extract_with_stats_fields():
    # lib.rs:147-175: stats carries node count (count of '<'), link/image
    # counts from the output arrays, and non-negative time/memory.
    content, stats = contract.extract_with_stats(GOOD, "https://e.example.com/", "article")
    assert stats.nodes_processed == GOOD.count("<")
    assert stats.links_found == len(content["links"]) == 1
    assert stats.images_found == len(content["media"])
    assert stats.processing_time_ms >= 0
    assert stats.memory_used >= 0


def test_validate_html_boolean_never_raises():
    # lib.rs:178-184
    assert contract.validate_html(GOOD) is True
    assert contract.validate_html("") is False
    assert contract.validate_html("just text, no markup") is False
    assert contract.validate_html("<html></html>") is False  # no body/content tags


def test_health_check_and_counter():
    contract.reset_state()
    before = contract.health_check()
    assert before.status == "healthy"
    assert before.extraction_count == 0
    contract.extract(GOOD, "https://e.example.com/", "article")
    after = contract.health_check()
    assert after.extraction_count == 1


def test_get_info_features_verbatim():
    # lib.rs:199-221 feature list
    info = contract.get_info()
    assert info.component_model_version == "0.2.0"
    assert "article-extraction" in info.features
    assert "url-resolution" in info.features
    assert len(info.features) == 10
    assert info.supported_modes == contract.get_modes()


def test_reset_state_message_quirk():
    # lib.rs:223-244 stores 0 before reading "previous" count → always 0.
    contract.extract(GOOD, "https://e.example.com/", "article")
    msg = contract.reset_state()
    assert msg == "Component state reset successfully. Previous extraction count: 0"
    assert contract.health_check().extraction_count == 0


def test_get_modes_strings():
    # lib.rs:609-616
    modes = contract.get_modes()
    assert len(modes) == 4
    assert modes[0].startswith("article - ")
    assert modes[3].startswith("custom - ")
