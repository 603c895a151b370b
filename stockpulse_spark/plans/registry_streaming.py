"""Streaming queries in the driver gate.

These run a REAL Structured Streaming query (file source over the
testdata parquet, availableNow trigger, memory sink) and return the
materialized result. Genuinely non-SQL-expressible (stateful watermark
semantics), so no DuckDB oracle — the driver records the weaker
rows-only check; the strong assertions live in tests/test_streaming.py
(stream == batch once windows close) and tests/test_stateful.py.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, max_by_nn, min_by_nn

from stockpulse_spark.plans.registry import _register, _t
from stockpulse_spark.sources.tables import (
    load_table,
    read_events_stream,
)


@_register(
    "stream_dedup_hourly",
    oracle=None,  # stateful streaming semantics — rows-only check
    tags=("streaming",),
    doc="reference T1/T2/T6 live: replays the events parquet as a file "
    "stream, applies watermark dedup, tumbling 1-hour OHLC resample, "
    "availableNow trigger into a memory sink. Append mode emits only "
    "windows closed by the final watermark (deterministic for a fixed "
    "input). Batch-equality is asserted in tests/test_streaming.py.",
)
def q_stream_dedup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin TZ + nanosAsLong conf via load_table, then take the RAW
    # on-disk schema (ts as INT64 nanos) for the stream reader and
    # normalize to microsecond timestamps exactly like load_table
    load_table(spark, sf_dir, "events")
    import os
    stream = read_events_stream(spark, sf_dir)
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicates(
        ["user_id", "ts"]
    )
    agg = (
        deduped.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.round(min_by_nn(nan_nn("value"), "ts") * 1e6).alias("__o"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "user_id",
            (F.col("__o") / 1e6).alias("open"),
            "high",
            "low",
            "volume",
        )
    )
    name = f"stream_dedup_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_dedup_hourly: availableNow run exceeded 300s; "
            "refusing to return a partially populated memory table"
        )
    return spark.table(name)


@_register(
    "stream_session_windows",
    oracle=None,  # stateful session-merge semantics — rows-only check;
    # oracle-anchored transitively via session_windows_batch (equality
    # asserted in tests/test_streaming.py)
    tags=("streaming", "session"),
    doc="Structured Streaming SESSION windows under a watermark: "
    "30-min inactivity gap closes a session, 2-hour watermark bounds "
    "merge state, availableNow → memory sink emits only finalized "
    "sessions. The streaming form of sessionize_events; its emitted "
    "row set equals the oracle-checked session_windows_batch twin.",
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events")
    import os
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum("value") * 1e6) / 1e6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_session_windows: availableNow run exceeded 300s"
        )
    return spark.table(name)


@_register(
    "session_windows_batch",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ), agg AS (
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             COUNT(*) AS n_events,
             ROUND(SUM(value), 6) AS total_value
      FROM sessions GROUP BY user_id, session_id
    ), wm AS (
      SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events
    )
    SELECT session_start, session_end, user_id, n_events, total_value
    FROM agg, wm WHERE session_end <= wm.wm
    """,
    tags=("streaming", "session"),
    doc="batch twin of stream_session_windows: native session_window "
    "in batch mode, restricted to sessions finalized by the final "
    "watermark (session end = last event + 30-min gap ≤ max event "
    "time − 2h). Oracle = the lag→cumsum sessionization in exact "
    "microseconds (same CTE as sessionize_events) + the watermark "
    "cut. The stream row set equals this query row-for-row "
    "(tests/test_streaming.py), closing the oracle loop on streaming "
    "session semantics.",
)
def q_session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm"))
    agg = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum("value") * 1e6) / 1e6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    return (
        agg.join(F.broadcast(wm))
        .filter(F.col("session_end") <= F.col("wm"))
        .drop("wm")
    )


@_register(
    "stream_dedup_hourly_batch",
    oracle="""
    WITH dd AS (
      SELECT user_id, ts, MIN(value) AS value
      FROM events GROUP BY user_id, ts
    ), wm AS (
      SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM dd
    ), agg AS (
      SELECT date_trunc('hour', ts) AS bucket_start,
             user_id,
             ROUND(first(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)), 6) AS open,
             MAX(value) AS high,
             MIN(value) AS low,
             COUNT(*) AS volume
      FROM dd GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT a.* FROM agg a, wm
    WHERE a.bucket_start + INTERVAL 1 HOUR <= wm.wm
    """,
    tags=("streaming", "agg"),
    doc="batch twin of stream_dedup_hourly: the SAME closed-window "
    "result the availableNow stream emits — dedup on (user_id, ts), "
    "1-hour tumbling OHLC, restricted to windows whose end is at or "
    "before the final watermark (max event time − 2h). This anchors "
    "the streaming query's semantics to a DuckDB oracle: the stream "
    "row set equals this batch row set (asserted exactly in "
    "tests/test_streaming.py::test_stream_dedup_matches_batch_twin), "
    "and this query is oracle-checked — so the watermark/append "
    "semantics are indirectly oracle-verified, not just rows-counted.",
)
def q_stream_dedup_hourly_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dd = ev.groupBy("user_id", "ts").agg(F.min("value").alias("value"))
    wm = dd.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    )
    agg = (
        dd.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            (F.round(min_by_nn(nan_nn("value"), "ts") * 1e6) / 1e6).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("__end"),
            "user_id",
            "open",
            "high",
            "low",
            "volume",
        )
    )
    return (
        agg.join(F.broadcast(wm))
        .filter(F.col("__end") <= F.col("wm"))
        .drop("__end", "wm")
    )
