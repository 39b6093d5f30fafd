"""Vendored classic-PDF parser (E18/S7): fixture round-trip, escapes,
Flate streams, page order, image counts, info dict, and the extraction
UDF's reference field mapping (processor.rs:642-760)."""

from __future__ import annotations

import pytest

from riptide_spark.functions.pdftext import (
    PdfInvalid,
    build_minimal_pdf,
    extract_page_text,
    parse_pdf,
)


def test_single_page_round_trip():
    data = build_minimal_pdf(["Hello PDF world."])
    doc = parse_pdf(data)
    assert [p.text for p in doc.pages] == ["Hello PDF world."]
    assert doc.text == "Hello PDF world.\n"
    assert doc.image_count == 0


def test_multi_page_order_and_join():
    data = build_minimal_pdf(["page one", "page two", "page three"])
    doc = parse_pdf(data)
    assert [p.text for p in doc.pages] == ["page one", "page two", "page three"]
    # processor.rs:692-696: each page's text followed by '\n'.
    assert doc.text == "page one\npage two\npage three\n"


def test_escapes_and_unicode_round_trip():
    tricky = "parens () back\\slash\nnewline tab\t and café ± ≥"
    doc = parse_pdf(build_minimal_pdf([tricky]))
    assert doc.pages[0].text == tricky


def test_flate_compressed_stream():
    text = "compressed content " * 50
    doc = parse_pdf(build_minimal_pdf([text], compress=True))
    assert doc.pages[0].text == text


def test_image_placeholder_counting():
    data = build_minimal_pdf(["a", "b"], images_per_page=2)
    doc = parse_pdf(data)
    assert [p.image_count for p in doc.pages] == [2, 2]
    assert doc.image_count == 4


def test_info_dictionary():
    info = {
        "Title": "A Report",
        "Author": "J. Doe",
        "Producer": "riptide-test",
        "Subject": "quarterly (draft)",
    }
    doc = parse_pdf(build_minimal_pdf(["x"], info=info))
    assert doc.info == info


def test_invalid_bytes_raise():
    with pytest.raises(PdfInvalid):
        parse_pdf(b"short")
    with pytest.raises(PdfInvalid):
        parse_pdf(b"<html>not a pdf at all</html>")
    with pytest.raises(PdfInvalid):
        parse_pdf(b"%PDF-1.4\njunk with no objects")


def test_hex_string_and_tj_array():
    content = b"BT [(Hel) (lo)] TJ <20776F726C64> Tj ET"
    assert extract_page_text(content) == "Hello world"


def test_newline_operators():
    content = b"BT (line one) Tj T* (line two) ' ET"
    assert extract_page_text(content) == "line one\nline two"


def test_udf_pdf_row_reference_mapping():
    from riptide_spark.operators.extract_udf import _extract_one

    words = "alpha beta gamma " * 80  # 240 words
    data = build_minimal_pdf(
        [words.strip(), "tail page"],
        images_per_page=1,
        info={"Title": "T", "Author": "A", "Producer": "P", "Subject": "S"},
    )
    row = _extract_one(data, "https://x.example.com/doc.pdf", "pdf")
    assert row["error"] is None
    assert row["extracted_text"] == words.strip() + "\n" + "tail page" + "\n"
    assert row["title"] == "T" and row["byline"] == "A"
    assert row["site_name"] == "P" and row["description"] == "S"
    assert row["quality_score"] == 85
    assert row["word_count"] == 242
    assert row["reading_time"] == max(242 // 200, 1)
    assert row["media"] == ["pdf:image:0", "pdf:image:1"]
    assert row["categories"] == ["document", "pdf"]


def test_udf_pdf_fallback_on_garbage():
    from riptide_spark.operators.extract_udf import _extract_one

    row = _extract_one(b"%PDF-1.4\ngarbage", "https://x/doc.pdf", "pdf")
    assert row["error"] is None
    assert row["quality_score"] == 20
    assert row["categories"] == ["pdf", "error"]
    assert row["description"] == "Failed to process PDF document"


def test_structural_keywords_inside_text_do_not_break_parsing():
    """Uncompressed content streams are skipped by /Length during the
    object scan, so PDF structural keywords appearing in document text
    cannot truncate or fake objects."""
    tricky = [
        "this text contains endstream and endobj keywords",
        "and even 1 0 obj plus stream and xref and %%EOF markers",
        "trailer << /Root 1 0 R >> startxref 12345",
    ]
    doc = parse_pdf(build_minimal_pdf(tricky))
    assert [p.text for p in doc.pages] == tricky
    doc2 = parse_pdf(build_minimal_pdf(tricky, compress=True))
    assert [p.text for p in doc2.pages] == tricky


def test_indirect_stream_length_resolved():
    """`/Length 5 0 R` is an indirect reference — the integer is an object
    NUMBER, not a byte count. Treating it as the count mis-skips the stream
    (ADVICE r2); the parser must resolve it via the object table (or fall
    back to the endstream scan) and still extract the real text."""
    stream = b"BT /F1 12 Tf 72 720 Td (Indirect length page) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + stream + b"\nendstream\nendobj\n"
        b"5 0 obj\n" + str(len(stream)).encode() + b"\nendobj\n"
        b"%%EOF\n"
    )
    doc = parse_pdf(pdf)
    assert [p.text for p in doc.pages] == ["Indirect length page"]


def test_direct_length_not_confused_by_indirect_form():
    """The direct-/Length regex must not match the object number inside an
    indirect reference, nor a digit prefix of it."""
    from riptide_spark.functions.pdftext import _DIRECT_LENGTH_RE

    assert _DIRECT_LENGTH_RE.search(b"<< /Length 12 0 R >>") is None
    m = _DIRECT_LENGTH_RE.search(b"<< /Length 42 /Filter /FlateDecode >>")
    assert m is not None and m.group(1) == b"42"
