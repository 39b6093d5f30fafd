"""Multimodal binary-column plumbing: magic sniffing (native), mapInPandas
decode/feature/frame-sample shape, determinism across executors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riptide_spark.operators.multimodal import (
    decode_images,
    repartition_by_payload_bytes,
    sample_frames,
    sniff_media_type,
)

ROWS = [
    ("jpeg1", b"\xff\xd8\xff\xe0" + b"j" * 3000),
    ("png1", b"\x89PNG\r\n\x1a\n" + b"p" * 5000),
    ("gif1", b"GIF89a" + b"g" * 100),
    ("webp1", b"RIFF\x00\x00\x00\x00WEBP" + b"w" * 200),
    ("wav1", b"RIFF\x00\x00\x00\x00WAVE" + b"a" * 200),
    ("mp31", b"ID3\x04" + b"m" * 150),
    ("pdf1", b"%PDF-1.7 stub"),
    ("junk", b"\x00\x01\x02unknown"),
]


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(ROWS, "media_id string, payload binary")


def test_sniff_media_type_native(spark, media):
    got = {
        r["media_id"]: r["mt"]
        for r in media.select("media_id", sniff_media_type(F.col("payload")).alias("mt")).collect()
    }
    assert got["jpeg1"] == "image/jpeg"
    assert got["png1"] == "image/png"
    assert got["gif1"] == "image/gif"
    assert got["webp1"] == "image/webp"
    assert got["wav1"] == "audio/wav"
    assert got["mp31"] == "audio/mpeg"
    assert got["pdf1"] == "application/pdf"
    assert got["junk"] in ("application/octet-stream", "video/mp4")
    # and it is pure JVM (no Python eval nodes in the plan)
    plan = (
        media.select(sniff_media_type(F.col("payload")).alias("mt"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_decode_images_stub_plumbing(spark, media):
    out = decode_images(media).collect()
    assert len(out) == len(ROWS)
    by_id = {r["media_id"]: r for r in out}
    jpeg = by_id["jpeg1"]
    assert jpeg["decode_error"] is None
    assert jpeg["payload_bytes"] == 3004
    assert 64 <= jpeg["width"] < 256 and 64 <= jpeg["height"] < 256
    assert len(jpeg["embedding"]) == 8
    assert all(-0.5 <= v <= 0.5 for v in jpeg["embedding"])


def test_decode_images_deterministic(spark, media):
    first = {r["media_id"]: (r["width"], r["height"], tuple(r["embedding"]))
             for r in decode_images(media.repartition(1)).collect()}
    second = {r["media_id"]: (r["width"], r["height"], tuple(r["embedding"]))
              for r in decode_images(media.repartition(4)).collect()}
    assert first == second


def test_decode_strict_raises_not_implemented_into_error_column(spark, media):
    out = decode_images(media, strict=True).collect()
    assert all(r["decode_error"] is not None for r in out)
    assert all("NotImplemented" in r["decode_error"] or "decoder" in r["decode_error"]
               for r in out)


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media, every_ms=500).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # png payload 5008 bytes → min(8, 5008//1024)=4 frames
    png_frames = sorted(by_id["png1"], key=lambda r: r["frame_index"])
    assert len(png_frames) == 4
    assert [f["ts_ms"] for f in png_frames] == [0, 500, 1000, 1500]
    assert len({f["frame_fingerprint"] for f in png_frames}) == 4
    # every input row produced at least one frame
    assert set(by_id) == {r[0] for r in ROWS}


def test_repartition_by_payload_bytes(spark, media):
    out = repartition_by_payload_bytes(media, target_bytes_per_partition=4096)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == len(ROWS)
