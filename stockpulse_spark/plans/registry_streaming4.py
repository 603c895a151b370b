"""Streaming incremental rollup maintenance: the streaming twin of
`mergeable_weekly_rollup` (registry_mlstats.py).

The IVM story end to end: the batch query proves the daily->weekly
state-merge law; this one maintains the SAME weekly states
incrementally under Structured Streaming — watermarked tumbling
7-day windows aligned to Monday (window() startTime offset), integer-
cents power sums as the running state, append mode sealing each week
exactly once when the watermark passes. A sealed week is never
touched again: that is the contract that lets a 100 TB warehouse
serve rollups while history stays immutable.

`weekly_rollup_closed_batch` is the oracle-checked batch twin (the
same rollup cut at the final watermark); equality of the two is
asserted in tests/test_streaming3.py-style fashion in
tests/test_wave6_streaming.py.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.sources.tables import (
    load_table,
    read_events_stream,
)


def _weekly_states(df: DataFrame) -> DataFrame:
    """Shared weekly-state aggregation (stream and batch sides):
    integer-cents power sums per (Monday-aligned 7-day window, type)."""
    cents = F.round(nan_nn("value") * 100).cast("bigint")
    return (
        df.groupBy(
            # epoch day 0 is a Thursday; startTime '4 days' aligns the
            # tumbling 7-day windows to Monday 00:00 = date_trunc('week')
            F.window("ts", "7 days", "7 days", "4 days").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s"),
            F.sum(cents * cents).alias("s2"),
            F.min(cents).alias("mn"),
            F.max(cents).alias("mx"),
        )
    )


def _finalize(states: DataFrame) -> DataFrame:
    sd = F.col("s").cast("double")
    return states.select(
        F.col("w.start").cast("date").alias("week"),
        "event_type",
        "n",
        _r6(sd / F.col("n") / 100.0).alias("avg_value"),
        _r6(
            # sample variance of a single observation is undefined
            F.when(
                F.col("n") > 1,
                (F.col("s2").cast("double") - sd * sd / F.col("n"))
                / (F.col("n") - 1)
                / 10000.0,
            )
        ).alias("var_value"),
        _r6(F.col("mn") / 100.0).alias("min_value"),
        _r6(F.col("mx") / 100.0).alias("max_value"),
    )


@_register(
    "stream_weekly_rollup",
    oracle=None,  # watermark/append semantics — rows-only check; the
    # emitted set equals weekly_rollup_closed_batch (tests)
    tags=("streaming", "incremental"),
    doc="incrementally maintained weekly rollup on the live event "
    "stream: Monday-aligned tumbling 7-day windows under a 2-hour "
    "watermark carry (n, sum, sum2, min, max) integer-cents state; "
    "append mode seals each (week, type) exactly once when the "
    "watermark passes the week end. availableNow -> memory sink. "
    "The emitted rows equal the oracle-checked batch twin "
    "`weekly_rollup_closed_batch` row-for-row.",
)
def q_stream_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events")  # pin TZ + reader confs
    stream = read_events_stream(spark, sf_dir)
    agg = _finalize(_weekly_states(stream.withWatermark("ts", "2 hours")))
    name = f"stream_weekly_rollup_{uuid.uuid4().hex[:8]}"
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
        raise TimeoutError("stream_weekly_rollup: run exceeded 300s")
    return spark.table(name)


@_register(
    "weekly_rollup_closed_batch",
    oracle="""
    WITH w AS (
      SELECT event_type,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_ts,
             COUNT(*) AS n,
             SUM(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS s,
             SUM(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)
                 * CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS s2,
             MIN(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS mn,
             MAX(CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT)) AS mx
      FROM events GROUP BY 1, 2
    ), wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
    SELECT CAST(week_ts AS DATE) AS week, event_type, n,
           ROUND(CAST(s AS DOUBLE) / n / 100.0, 6) AS avg_value,
           ROUND(CASE WHEN n > 1 THEN
                   (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
                    * CAST(s AS DOUBLE) / n) / (n - 1) / 10000.0 END, 6)
             AS var_value,
           ROUND(mn / 100.0, 6) AS min_value,
           ROUND(mx / 100.0, 6) AS max_value
    FROM w, wm
    WHERE week_ts + INTERVAL 7 DAY <= wm.wm
    ORDER BY event_type, week
    """,
    tags=("streaming", "agg", "incremental"),
    doc="batch twin of stream_weekly_rollup with a DuckDB oracle: the "
    "identical weekly integer-cents rollup cut at the final "
    "watermark (weeks whose end the watermark passed). The stream's "
    "sealed rows equal this set exactly — asserted in tests — which "
    "pins the append-mode semantics to plain SQL.",
)
def q_weekly_rollup_closed_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    )
    states = _weekly_states(ev)
    return (
        _finalize(states)
        .withColumn("week_end", F.date_add(F.col("week"), 7))
        .join(F.broadcast(wm))
        .filter(F.col("week_end").cast("timestamp") <= F.col("wm"))
        .drop("week_end", "wm")
        .orderBy("event_type", "week")
    )


@_register(
    "stream_kalman_filter",
    oracle=None,  # custom stateful operator — rows-only; anchored by
    # kalman_events_batch equality (tests/test_kalman_stream.py)
    tags=("streaming", "stateful", "statespace"),
    doc="ONLINE Kalman filter as a custom stateful operator "
    "(streaming/transform_state.py:running_kalman_filter): per-user "
    "(n, level, err_var) carried in keyed state, the local-level "
    "recursion folded per micro-batch with Python-float updates that "
    "mirror the JVM fold operation-for-operation — so any batch "
    "split reproduces `kalman_events_batch`'s final state "
    "bit-for-bit (asserted in tests). Binds to "
    "transformWithStateInPandas where the runtime allows, else "
    "applyInPandasWithState; one fixed-width state row per key.",
)
def q_stream_kalman_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.streaming.transform_state import (
        has_transform_with_state_runtime,
        running_kalman_filter,
    )

    load_table(spark, sf_dir, "events")
    if has_transform_with_state_runtime():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    stream = read_events_stream(spark, sf_dir)
    out = running_kalman_filter(stream.select("user_id", "ts", "value"))
    name = f"stream_kalman_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream_kalman_filter: run exceeded 300s")
    return spark.table(name)
