"""Property-based round-trips for the vendored codecs (hypothesis):
arbitrary text survives the PDF writer→parser, arbitrary images survive
the BMP writer→parser — the escaping/addressing edge cases a fixed
fixture set can miss."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from riptide_spark.functions.bmp import decode_bmp, encode_bmp
from riptide_spark.functions.pdftext import build_minimal_pdf, parse_pdf

# Text containing any unicode except surrogates (PDF literal strings are
# written/decoded as UTF-8 by convention).
pdf_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=120, deadline=None)
@given(pages=st.lists(pdf_text, min_size=1, max_size=4), compress=st.booleans())
def test_pdf_text_round_trip(pages, compress):
    doc = parse_pdf(build_minimal_pdf(pages, compress=compress))
    assert [p.text for p in doc.pages] == pages
    assert doc.text == "".join(p + "\n" for p in pages)


@settings(max_examples=60, deadline=None)
@given(
    pages=st.lists(pdf_text, min_size=1, max_size=3),
    images=st.integers(min_value=0, max_value=4),
    info=st.fixed_dictionaries(
        {},
        optional={
            "Title": pdf_text.filter(lambda s: s.strip() != ""),
            "Author": pdf_text.filter(lambda s: s.strip() != ""),
        },
    ),
)
def test_pdf_metadata_and_images_round_trip(pages, images, info):
    doc = parse_pdf(build_minimal_pdf(pages, images_per_page=images, info=info))
    assert doc.image_count == images * len(pages)
    for key, value in info.items():
        assert doc.info.get(key) == value


rgb = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@settings(max_examples=120, deadline=None)
@given(
    width=st.integers(min_value=2, max_value=24),
    height=st.integers(min_value=1, max_value=24),
    background=rgb,
    marker=st.one_of(st.none(), rgb),
)
def test_bmp_round_trip(width, height, background, marker):
    img = decode_bmp(encode_bmp(width, height, background, marker))
    assert (img.width, img.height) == (width, height)
    for y, row in enumerate(img.pixels):
        for x, px in enumerate(row):
            if marker is not None and y == 0 and x == 1:
                assert px == marker
            else:
                assert px == background
