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
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_path)
    )
    agg = windowed_event_counts(events, window, watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _sessionize(key, pdfs, state):
    """applyInPandasWithState function: merge the group's batch rows into
    gap-delimited sessions, emit every CLOSED session, keep the open one
    in state with an event-time timeout at last_ts + gap (flushed when the
    watermark passes it)."""
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

    if state.hasTimedOut:
        out = []
        if state.exists:
            start_sec, last_sec, n = state.get
            out.append(emit(start_sec, last_sec, int(n)))
        state.remove()
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA])
        return

    seconds: list[float] = []
    for pdf in pdfs:
        seconds.extend(t.timestamp() for t in pdf["ts"])
    seconds.sort()
    if not seconds:
        yield pd.DataFrame([], columns=[f.name for f in SESSION_SCHEMA])
        return

    if state.exists:
        start_sec, last_sec, n = state.get
        start_sec, last_sec, n = float(start_sec), float(last_sec), int(n)
    else:
        start_sec, last_sec, n = seconds[0], seconds[0], 0
    closed = []
    for sec in seconds:
        if n and sec - last_sec > gap:
            closed.append(emit(start_sec, last_sec, n))
            start_sec, n = sec, 0
        last_sec = max(last_sec, sec)
        n += 1
    state.update((start_sec, last_sec, n))
    # Flush the open session once the user has been quiet past the gap.
    state.setTimeoutTimestamp(int((last_sec + gap) * 1000))
    yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA])


def start_sessionization_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 1,
):
    """Custom stateful operator: per-user session windows via
    ``applyInPandasWithState`` with event-time timeouts — the streaming
    twin of the batch ``events_sessionization`` oracle query."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_path)
    )
    sessions = (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
