"""Structured Streaming surface: incremental NDJSON delivery + exactly-once
resume via checkpoint (SURVEY.md §2.10/§3.3)."""

from __future__ import annotations

import json
import os

import pytest

from riptide_spark.schema import PAGES_SCHEMA
from riptide_spark.sources.pages import synth_page
from riptide_spark.streaming.ndjson import StreamConfig, progress_event, start_stream

N = 40


def _write_pages(spark, path: str, lo: int, hi: int) -> None:
    rows = [synth_page(i, seed=5) for i in range(lo, hi)]
    spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        PAGES_SCHEMA,
    ).coalesce(2).write.mode("append").parquet(path)


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return {
        "input": str(base / "pages"),
        "output": str(base / "out"),
        "ndjson": str(base / "feed"),
        "checkpoint": str(base / "ckpt"),
    }


def test_stream_extracts_incrementally(spark, stream_dirs):
    _write_pages(spark, stream_dirs["input"], 0, N)
    config = StreamConfig(
        input_path=stream_dirs["input"],
        output_path=stream_dirs["output"],
        ndjson_path=stream_dirs["ndjson"],
        checkpoint_path=stream_dirs["checkpoint"],
        max_files_per_trigger=1,
    )
    query = start_stream(spark, config)
    query.awaitTermination(timeout=300)
    assert not query.isActive

    out = spark.read.parquet(os.path.join(stream_dirs["output"], "data"))
    assert out.count() == N
    assert out.select("url").distinct().count() == N

    # NDJSON feed: multiple micro-batches (maxFilesPerTrigger=1 → incremental
    # delivery, the TTFB analog), one directory per batch written by the
    # executors (part-files), one valid JSON object per line.
    feed_batches = sorted(
        d for d in os.listdir(stream_dirs["ndjson"]) if d.startswith("batch-")
    )
    assert len(feed_batches) >= 2
    lines = []
    for batch in feed_batches:
        bdir = os.path.join(stream_dirs["ndjson"], batch)
        for name in sorted(os.listdir(bdir)):
            if not name.startswith("part-"):
                continue
            with open(os.path.join(bdir, name), encoding="utf-8") as fh:
                lines.extend(line for line in fh.read().splitlines() if line)
    assert len(lines) == N
    parsed = [json.loads(line) for line in lines]
    assert all("url" in p and "content_mode" in p for p in parsed)
    # Null fields stay present (serde-style serialization, not dropped).
    assert all("error" in p for p in parsed)


def test_stream_resumes_exactly_once(spark, stream_dirs):
    """New input files after a restart are processed; old ones are not
    reprocessed (checkpoint-driven resume — the streaming analog of the
    batch anti-join)."""
    _write_pages(spark, stream_dirs["input"], N, N + 10)
    config = StreamConfig(
        input_path=stream_dirs["input"],
        output_path=stream_dirs["output"],
        ndjson_path=stream_dirs["ndjson"],
        checkpoint_path=stream_dirs["checkpoint"],
    )
    query = start_stream(spark, config)
    query.awaitTermination(timeout=300)

    out = spark.read.parquet(os.path.join(stream_dirs["output"], "data"))
    assert out.count() == N + 10
    assert out.select("url").distinct().count() == N + 10
    event = progress_event(query)
    assert event["event"] == "progress"


def test_first_batch_latency_bound(spark, tmp_path):
    """TTFB analog of the reference's 500 ms first-chunk streaming test
    (ndjson_stream_tests.rs:331): with 8 input files and
    maxFilesPerTrigger=1, the FIRST NDJSON micro-batch must land on disk
    (a) well before the stream finishes — incremental delivery, not
    batch-at-end — and (b) under a pinned absolute bound. The absolute
    bound is generous relative to the reference's native 500 ms because a
    local-mode first batch pays JVM codegen + Python worker spin-up once;
    the *shape* (TTFB << total) is the contract that matters at scale."""
    import time

    base = tmp_path
    dirs = {
        "input": str(base / "pages"),
        "output": str(base / "out"),
        "ndjson": str(base / "feed"),
        "checkpoint": str(base / "ckpt"),
    }
    for i in range(8):
        rows = [synth_page(j, seed=9) for j in range(i * 10, (i + 1) * 10)]
        spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
            PAGES_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(dirs["input"])

    config = StreamConfig(
        input_path=dirs["input"],
        output_path=dirs["output"],
        ndjson_path=dirs["ndjson"],
        checkpoint_path=dirs["checkpoint"],
        max_files_per_trigger=1,
    )

    def first_batch_on_disk() -> bool:
        if not os.path.isdir(dirs["ndjson"]):
            return False
        for d in os.listdir(dirs["ndjson"]):
            bdir = os.path.join(dirs["ndjson"], d)
            if d.startswith("batch-") and any(
                n.startswith("part-") and os.path.getsize(os.path.join(bdir, n)) > 0
                for n in os.listdir(bdir)
            ):
                return True
        return False

    start = time.perf_counter()
    query = start_stream(spark, config)
    ttfb = None
    try:
        while query.isActive:
            if ttfb is None and first_batch_on_disk():
                ttfb = time.perf_counter() - start
            time.sleep(0.05)
    finally:
        query.awaitTermination(timeout=300)
    total = time.perf_counter() - start
    if ttfb is None and first_batch_on_disk():
        # The whole stream finished before the poll loop ever observed the
        # first batch — TTFB ≤ total by definition, so only the absolute
        # bound is assertable (the relative check would spuriously fail on
        # exactly the fastest runs).
        assert total < 60.0, f"stream took {total:.1f}s"
        return
    assert ttfb is not None, "no NDJSON batch ever appeared"
    assert ttfb < 60.0, f"first micro-batch took {ttfb:.1f}s"
    # Incremental delivery: the first of 8 micro-batches must not take the
    # bulk of the run (batch-at-end would give ttfb ≈ total).
    assert ttfb <= 0.75 * total, f"ttfb {ttfb:.1f}s vs total {total:.1f}s"
