"""Vendored 24-bpp BMP codec: round-trip, addressing, stride padding,
variant rejection, and the real decode path through decode_images."""

from __future__ import annotations

import pytest

from riptide_spark.functions.bmp import (
    BmpInvalid,
    decode_bmp,
    encode_bmp,
    row_size,
)


def test_round_trip_uniform():
    data = encode_bmp(5, 3, background=(10, 20, 30))
    img = decode_bmp(data)
    assert (img.width, img.height) == (5, 3)
    assert all(px == (10, 20, 30) for row in img.pixels for px in row)
    assert img.channel_means() == (10.0, 20.0, 30.0)


def test_marker_lands_top_left_row():
    """The marker is written at image (x=1, y=0); a decoder that forgets
    the bottom-up flip would find background there."""
    data = encode_bmp(4, 3, background=(0, 0, 0), marker=(200, 100, 50))
    img = decode_bmp(data)
    assert img.pixels[0][1] == (200, 100, 50)
    assert img.pixels[2][1] == (0, 0, 0)
    r, g, b = img.channel_sums()
    assert (r, g, b) == (200, 100, 50)


def test_stride_padding_widths():
    # widths whose 3*w is not 4-aligned exercise the padding math
    for w in (2, 3, 4, 5, 6, 7):
        assert row_size(w) % 4 == 0
        data = encode_bmp(w, 2, background=(1, 2, 3), marker=(9, 8, 7))
        img = decode_bmp(data)
        assert (img.width, img.height) == (w, 2)
        assert img.pixels[0][1] == (9, 8, 7)
        assert img.pixels[1][0] == (1, 2, 3)


def test_payload_size_formula():
    data = encode_bmp(7, 5, background=(0, 0, 0))
    assert len(data) == 54 + 5 * row_size(7)


def test_rejects_non_bmp_and_variants():
    with pytest.raises(BmpInvalid):
        decode_bmp(b"not a bmp at all, definitely too short?")
    with pytest.raises(BmpInvalid):
        decode_bmp(b"XX" + bytes(60))
    data = bytearray(encode_bmp(3, 3, background=(0, 0, 0)))
    data[28] = 32  # bpp 24 → 32
    with pytest.raises(BmpInvalid):
        decode_bmp(bytes(data))
    trunc = encode_bmp(3, 3, background=(0, 0, 0))[:-4]
    with pytest.raises(BmpInvalid):
        decode_bmp(trunc)


def test_decode_images_real_bmp_path(spark):
    from riptide_spark.operators.multimodal import decode_images

    payloads = [
        ("bmp1", encode_bmp(6, 4, background=(100, 150, 200), marker=(1, 2, 3))),
        ("bad", b"BM" + b"\x00" * 40),  # BMP magic, broken header
        ("jpeg", b"\xff\xd8\xff" + b"x" * 64),  # stays on the stub path
    ]
    df = spark.createDataFrame(payloads, "media_id string, payload binary")
    rows = {r["media_id"]: r for r in decode_images(df).collect()}

    real = rows["bmp1"]
    assert real["media_type"] == "image/bmp"
    assert (real["width"], real["height"]) == (6, 4)
    n = 24
    assert real["mean_r"] == round((100 * (n - 1) + 1) / n, 6)
    assert (real["probe_r"], real["probe_g"], real["probe_b"]) == (1, 2, 3)
    assert real["decode_error"] is None

    assert rows["bad"]["decode_error"] is not None
    assert rows["bad"]["width"] is None

    stub = rows["jpeg"]
    assert stub["media_type"] == "image/stub"
    assert stub["mean_r"] is None  # means only exist on the real path
