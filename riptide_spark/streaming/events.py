"""Stateful Structured Streaming over the events stream (§2.10 scale-out).

Two operators a 100 TB ingestion pipeline needs beyond the NDJSON delivery
surface (`streaming/ndjson.py`):

* **watermarked windowed aggregation** — tumbling event-time windows with a
  late-data watermark; append mode emits a window exactly once, when the
  watermark passes its end (late rows inside the watermark are folded in,
  rows later than the watermark are dropped — both behaviors pinned by
  ``tests/test_streaming_events.py``).
* **custom stateful sessionization** via ``applyInPandasWithState`` — the
  streaming twin of the batch ``events_sessionization`` query (30-minute
  inactivity gap, ``oracle_queries.q_sessionization``): per-user state
  holds the open session; closed sessions are emitted as soon as a larger
  gap arrives, and event-time timeouts flush sessions whose user went
  quiet once the watermark passes their gap horizon.

Both run on an unbounded ``readStream`` in production; the tests drive
them with ``availableNow`` over file batches, which is the same engine
code path (micro-batches + state store + watermark advancement between
batches).

**Skew + state sizing at 100 TB.** Both operators hold O(1) state per
key (one open session per user; one accumulator per live window×type),
so a hot key grows CPU within its task, never the store —
``tests/test_streaming_events.py`` pins a 50 %-of-traffic hot user at
≤ 1 state row. For production executors, switch the store off the
default in-JVM-heap HDFS backend to RocksDB so state lives off-heap and
spills to local SSD instead of pressuring the executor heap::

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    # optional: bound memory via
    # spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage=true

Both skew tests in ``tests/test_streaming_events.py`` run twice — once
on the default HDFS-heap provider, once on RocksDB (the bundled
rocksdbjni) — asserting identical outputs, the same ≤1-row-per-key state
bound, and provider engagement via the rocksdb* custom metrics in the
query progress.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_GAP_SECONDS = 1800  # q_sessionization's 30-minute inactivity gap

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_sec", T.DoubleType()),
        T.StructField("last_sec", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a late-data
    watermark. Works on both a batch and a streaming DataFrame (the same
    declarative plan — Structured Streaming's contract); on a stream in
    append mode each window is emitted exactly once, finalized."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _read_events_stream(spark: SparkSession, input_path: str, max_files: int):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files))
        .parquet(input_path)
    )


def _start_parquet_sink(df: DataFrame, output_path: str, checkpoint_path: str):
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def start_windowed_counts_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int = 1,
):
    """File-source stream → watermarked windowed agg → append-mode parquet
    sink. Append mode + watermark = each window row is written exactly
    once, when the watermark passes its end; windows still open when an
    ``availableNow`` run drains are held in the state store for the next
    incremental run (exactly the Iceberg-checkpoint resume contract)."""
    events = _read_events_stream(spark, input_path, max_files_per_trigger)
    agg = windowed_event_counts(events, window, watermark)
    return _start_parquet_sink(agg, output_path, checkpoint_path)


def _sessionize(key, pdfs, state):
    """applyInPandasWithState function: merge the group's batch rows plus
    the open-session interval from state into gap-delimited sessions
    (interval clustering over the sorted union, so out-of-order rows
    admitted under the previous batch's watermark extend or precede the
    open session correctly — SPARK-40925's two-watermark window), emit
    every CLOSED session, keep the newest one in state with an event-time
    timeout at last_ts + gap. Approximation bound inherent to O(1) state:
    a straggler older than every already-EMITTED session cannot reopen it
    (emitted sessions are final); it forms/joins a session among the rows
    still visible."""
    (user_id,) = key
    gap = SESSION_GAP_SECONDS

    def emit(start_sec: float, last_sec: float, n: int) -> dict:
        # Naive-UTC datetimes (the session timezone is pinned to UTC).
        def utc(sec: float) -> dt.datetime:
            return dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)

        return {
            "user_id": user_id,
            "session_start": utc(start_sec),
            "session_end": utc(last_sec),
            "n_events": n,
        }

    empty = pd.DataFrame([], columns=[f.name for f in SESSION_SCHEMA])

    if state.hasTimedOut:
        out = []
        if state.exists:
            start_sec, last_sec, n = state.get
            out.append(emit(float(start_sec), float(last_sec), int(n)))
        state.remove()
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA]) if out else empty
        return

    # Intervals (lo, hi, count): each event is a point; the open session
    # from state is one interval. Null timestamps cannot sessionize and
    # must not kill the task (NaT.timestamp() raises) — drop them, as the
    # windowed-agg surface does.
    intervals: list[tuple[float, float, int]] = []
    for pdf in pdfs:
        for t in pdf["ts"]:
            if not pd.isna(t):
                sec = t.timestamp()
                intervals.append((sec, sec, 1))
    if state.exists:
        start_sec, last_sec, n = state.get
        intervals.append((float(start_sec), float(last_sec), int(n)))
    if not intervals:
        yield empty
        return
    intervals.sort()

    merged: list[list] = []
    for lo, hi, cnt in intervals:
        if merged and lo - merged[-1][1] <= gap:
            merged[-1][1] = max(merged[-1][1], hi)
            merged[-1][2] += cnt
        else:
            merged.append([lo, hi, cnt])
    closed = [emit(lo, hi, cnt) for lo, hi, cnt in merged[:-1]]
    lo, hi, cnt = merged[-1]
    state.update((lo, hi, cnt))
    # Flush the open session once the user has been quiet past the gap.
    # Clamp above the CURRENT watermark: late-admitted rows (previous-batch
    # watermark) can put last+gap below it, and setTimeoutTimestamp rejects
    # sub-watermark timers by crashing the query (reproduced on 4.1.2).
    timeout_ms = max(int((hi + gap) * 1000), state.getCurrentWatermarkMs() + 1)
    state.setTimeoutTimestamp(timeout_ms)
    yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA]) if closed else empty


def start_sessionization_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "0 seconds",
    max_files_per_trigger: int = 1,
):
    """Custom stateful operator: per-user session windows via
    ``applyInPandasWithState`` with event-time timeouts — the streaming
    twin of the batch ``events_sessionization`` oracle query. ``watermark``
    is the out-of-order admission window; raise it on disordered feeds."""
    events = _read_events_stream(spark, input_path, max_files_per_trigger)
    sessions = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
    return _start_parquet_sink(sessions, output_path, checkpoint_path)
