"""Minimal 24-bit BMP codec — a REAL image decode path with no codec libs.

The sandbox has no PIL/opencv, so formats that need real codecs stay
stubbed in ``operators/multimodal.py`` — but BMP (BITMAPINFOHEADER,
24 bpp, uncompressed) is pure arithmetic: little-endian headers,
bottom-up pixel rows, 4-byte row padding, BGR channel order. Decoding it
for real exercises everything an image pipeline needs from the Spark
side: magic sniffing, header parsing, addressing (a wrong row order or
padding slip moves the probe pixel), and feature extraction.

The writer exists for deterministic fixtures (tests + the driver query's
oracle derives every output from the generator parameters).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, pixel offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


class BmpInvalid(ValueError):
    """Raised on non-BMP bytes or unsupported BMP variants."""


def row_size(width: int) -> int:
    """Bytes per pixel row: 3*width padded up to a 4-byte boundary."""
    return (width * 3 + 3) // 4 * 4


def encode_bmp(
    width: int,
    height: int,
    background: tuple[int, int, int],
    marker: tuple[int, int, int] | None = None,
) -> bytes:
    """24-bpp bottom-up BMP filled with ``background`` (RGB), with an
    optional ``marker`` pixel at image coordinate (x=1, y=0) — the top
    row, so a decoder that forgets the bottom-up flip reads background
    there instead."""
    if width < 2 or height < 1:
        raise ValueError("width must be >= 2 (marker column) and height >= 1")
    stride = row_size(width)
    pixel_bytes = stride * height
    header = _FILE_HEADER.pack(b"BM", 54 + pixel_bytes, 0, 0, 54)
    info = _INFO_HEADER.pack(40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    bg = bytes((background[2], background[1], background[0]))  # BGR on disk
    rows = bytearray()
    for y_stored in range(height):  # stored bottom-up: y_image = height-1-y_stored
        y_image = height - 1 - y_stored
        row = bytearray()
        for x in range(width):
            if marker is not None and y_image == 0 and x == 1:
                row += bytes((marker[2], marker[1], marker[0]))
            else:
                row += bg
        row += b"\x00" * (stride - len(row))
        rows += row
    return header + info + bytes(rows)


@dataclass
class BmpImage:
    width: int
    height: int
    pixels: list[list[tuple[int, int, int]]]  # top-down rows of RGB tuples

    @property
    def pixel_count(self) -> int:
        return self.width * self.height

    def channel_sums(self) -> tuple[int, int, int]:
        r = g = b = 0
        for row in self.pixels:
            for pr, pg, pb in row:
                r += pr
                g += pg
                b += pb
        return r, g, b

    def channel_means(self) -> tuple[float, float, float]:
        n = self.pixel_count
        r, g, b = self.channel_sums()
        return r / n, g / n, b / n


def decode_bmp(payload: bytes) -> BmpImage:
    """Parse a 24-bpp uncompressed BMP into top-down RGB rows."""
    if len(payload) < 54:
        raise BmpInvalid("Too small for a BMP header")
    magic, _file_size, _r1, _r2, pixel_offset = _FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise BmpInvalid("Not a BMP (missing BM magic)")
    (
        header_size, width, height, planes, bpp, compression,
        _image_size, _xppm, _yppm, _colors, _important,
    ) = _INFO_HEADER.unpack_from(payload, 14)
    if header_size < 40:
        raise BmpInvalid(f"Unsupported DIB header size {header_size}")
    if planes != 1 or compression != 0 or bpp != 24:
        raise BmpInvalid(f"Unsupported BMP variant (planes={planes}, bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpInvalid("Bad dimensions")
    stride = row_size(width)
    if len(payload) < pixel_offset + stride * height:
        raise BmpInvalid("Truncated pixel data")
    rows: list[list[tuple[int, int, int]]] = []
    for y_image in range(height):
        y_stored = (height - 1 - y_image) if bottom_up else y_image
        base = pixel_offset + y_stored * stride
        row = []
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return BmpImage(width=width, height=height, pixels=rows)
