"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns next to text. The
Spark-side plumbing here is real and tested — schemas, magic-byte sniffing
(native expressions), Arrow batch shape through ``mapInPandas``, partition
sizing by payload bytes. Codec status:

* **BMP payloads decode for REAL** — 24-bpp parsing (headers, bottom-up
  rows, stride padding) via the vendored pure-arithmetic codec in
  ``functions/bmp.py``; features are true width/height, channel means and
  a top-left probe pixel (which catches row-order/padding slips).
* Formats that need codec libraries (JPEG/PNG/video/audio — no
  PIL/ffmpeg/torchaudio in this image) keep the deterministic md5-derived
  stand-in (or raise ``NotImplementedError`` in strict mode) behind the
  same signature a real decoder would use; swap ``_decode_image_real`` in
  and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte signatures → media type; pure JVM-side sniffing.
_MAGIC = (
    ("image/bmp", b"BM"),
    ("image/jpeg", b"\xff\xd8\xff"),
    ("image/png", b"\x89PNG\r\n\x1a\n"),
    ("image/gif", b"GIF8"),
    ("image/webp", b"RIFF"),
    ("audio/wav", b"RIFF"),
    ("audio/mpeg", b"ID3"),
    ("video/mp4", b"\x00\x00\x00"),
    ("application/pdf", b"%PDF-"),
)


def sniff_media_type(payload: Column) -> Column:
    """Magic-byte media-type sniff as a native when/otherwise chain."""
    expr = F.lit("application/octet-stream")
    # Build the chain in reverse so earlier signatures take precedence.
    for media_type, magic in reversed(_MAGIC):
        prefix = F.substring(payload, 1, len(magic))
        expr = F.when(prefix == F.lit(magic), F.lit(media_type)).otherwise(expr)
    # WEBP vs WAV share the RIFF prefix; disambiguate on bytes 9-12.
    riff_kind = F.substring(payload, 9, 4)
    expr = (
        F.when(
            (F.substring(payload, 1, 4) == F.lit(b"RIFF")) & (riff_kind == F.lit(b"WEBP")),
            F.lit("image/webp"),
        )
        .when(
            (F.substring(payload, 1, 4) == F.lit(b"RIFF")) & (riff_kind == F.lit(b"WAVE")),
            F.lit("audio/wav"),
        )
        .otherwise(expr)
    )
    return expr


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("probe_r", T.IntegerType()),
        T.StructField("probe_g", T.IntegerType()),
        T.StructField("probe_b", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _fake_decode(payload: bytes, dims: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic md5-derived stand-in for a real image decode +
    feature extraction. Same payload → same (width, height, embedding) on
    every executor, which is what the plumbing tests pin."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    embedding = [((b / 255.0) - 0.5) for b in digest[2 : 2 + dims]]
    return width, height, embedding


def _decode_image_real(payload: bytes):  # pragma: no cover - no codec libs
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this image; "
        "wire a real decoder here — the Spark plumbing does not change"
    )


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dims: int = 8,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas image decode + feature extraction over binary payloads.

    ``mapInPandas`` (not a scalar UDF) because a real decoder wants to
    control batch memory: one oversized image must not blow the Arrow batch
    — the iterator shape lets the worker process rows one batch at a time
    and emit results incrementally.
    """

    from ..functions.bmp import BmpInvalid, decode_bmp

    def _row(media_id, payload: bytes, **kw) -> dict:
        base = {
            "media_id": str(media_id),
            "media_type": None,
            "payload_bytes": len(payload),
            "width": None,
            "height": None,
            "embedding": None,
            "mean_r": None,
            "mean_g": None,
            "mean_b": None,
            "probe_r": None,
            "probe_g": None,
            "probe_b": None,
            "decode_error": None,
        }
        base.update(kw)
        return base

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                if payload[:2] == b"BM":
                    # REAL decode path (vendored 24-bpp BMP codec).
                    try:
                        img = decode_bmp(payload)
                        mr, mg, mb = img.channel_means()
                        pr, pg, pb = img.pixels[0][1] if img.width > 1 else img.pixels[0][0]
                        embedding = [
                            mr / 255.0, mg / 255.0, mb / 255.0,
                            pr / 255.0, pg / 255.0, pb / 255.0,
                        ][:dims]
                        rows.append(
                            _row(
                                media_id, payload,
                                media_type="image/bmp",
                                width=img.width, height=img.height,
                                embedding=embedding,
                                mean_r=round(mr, 6), mean_g=round(mg, 6),
                                mean_b=round(mb, 6),
                                probe_r=pr, probe_g=pg, probe_b=pb,
                            )
                        )
                    except BmpInvalid as exc:
                        rows.append(_row(media_id, payload, decode_error=f"bmp: {exc}"))
                    continue
                try:
                    if strict:
                        _decode_image_real(payload)
                    width, height, embedding = _fake_decode(payload, dims)
                    rows.append(
                        _row(
                            media_id, payload,
                            media_type="image/stub",
                            width=width, height=height, embedding=embedding,
                        )
                    )
                except NotImplementedError as exc:
                    rows.append(_row(media_id, payload, decode_error=str(exc)))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_fingerprint", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling (1 row per sampled frame). The frame decode is a
    deterministic fingerprint stub; the fan-out shape (one input row → N
    output rows via mapInPandas) is the real, tested contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                # Stub duration: proportional to payload size.
                n_frames = min(max_frames, max(1, len(payload) // 1024))
                for i in range(n_frames):
                    fingerprint = hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                    rows.append(
                        {
                            "media_id": str(media_id),
                            "frame_index": i,
                            "ts_ms": i * every_ms,
                            "frame_fingerprint": fingerprint,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return df.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def repartition_by_payload_bytes(
    df: DataFrame, target_bytes_per_partition: int = 256 * 1024 * 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """Size partitions by payload volume, not row count — media rows vary by
    orders of magnitude, so row-count partitioning leaves stragglers."""
    total = df.select(F.sum(F.octet_length(payload_col)).alias("b")).collect()[0]["b"] or 0
    partitions = max(1, int(total / target_bytes_per_partition) + 1)
    return df.repartition(partitions)
