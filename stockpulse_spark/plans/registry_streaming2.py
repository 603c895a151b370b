"""Sliding (hopping) windows under a watermark — the streaming shape
the tumbling queries in registry_streaming don't cover: each event
lands in length/slide overlapping windows, and append mode emits a
window only once the watermark passes its end.

`stream_sliding_windows` runs the real Structured Streaming query
(file replay, availableNow, memory sink; rows-only in the driver gate);
`sliding_windows_batch` is its batch twin with a DuckDB oracle — the
oracle materializes the overlap by unnesting the k=2 window offsets per
event, which is exactly the expansion Spark's window() performs."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _register, _t
from stockpulse_spark.sources.tables import (
    load_table,
    read_events_stream,
)


def _sliding_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum("value") * 1e6) / 1e6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@_register(
    "stream_sliding_windows",
    oracle=None,  # watermark/append semantics — rows-only check; the
    # emitted set equals sliding_windows_batch (tests/test_streaming2.py)
    tags=("streaming",),
    doc="hopping-window aggregation on the live stream: 1-hour windows "
    "sliding every 30 minutes, 2-hour watermark, availableNow -> "
    "memory sink. Append emits each (window, event_type) exactly once "
    "when the final watermark passes the window end.",
)
def q_stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events")  # pin TZ + reader confs
    stream = read_events_stream(spark, sf_dir)
    agg = _sliding_agg(stream.withWatermark("ts", "2 hours"))
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
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
        raise TimeoutError("stream_sliding_windows: run exceeded 300s")
    return spark.table(name)


@_register(
    "sliding_windows_batch",
    oracle="""
    WITH expanded AS (
      SELECT e.event_type, e.value,
             CAST(to_timestamp(floor(epoch(e.ts) / 1800) * 1800
                               - 1800 * off.k) AS TIMESTAMP) AS window_start
      FROM events e
      CROSS JOIN (SELECT unnest([0, 1]) AS k) off
    ), agg AS (
      SELECT window_start,
             window_start + INTERVAL 1 HOUR AS window_end,
             event_type,
             COUNT(*) AS n_events,
             ROUND(SUM(value) * 1e6) / 1e6 AS total_value
      FROM expanded GROUP BY window_start, event_type
    ), wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
    SELECT a.* FROM agg a, wm WHERE a.window_end <= wm.wm
    """,
    tags=("streaming", "agg"),
    doc="batch twin of stream_sliding_windows with a DuckDB oracle: the "
    "k=2 overlapping 1h/30m windows expand via an explicit offset "
    "unnest (the same expansion window() performs), aggregated and cut "
    "at the final watermark. The stream's emitted rows equal this set "
    "row-for-row (tests/test_streaming2.py), anchoring hopping-window "
    "append semantics to an oracle.",
)
def q_sliding_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm"))
    agg = _sliding_agg(ev)
    return (
        agg.join(F.broadcast(wm))
        .filter(F.col("window_end") <= F.col("wm"))
        .drop("wm")
    )


@_register(
    "stream_up_streaks",
    oracle=None,  # transformWithState custom operator — rows-only;
    # anchored by up_streak_batch equality (tests/test_transform_state.py)
    tags=("streaming", "stateful"),
    doc="custom stateful operator (streaming/transform_state.py): "
    "per-user running count / max / longest consecutive up-move streak "
    "held in keyed state, emitted per micro-batch. Binds to Spark 4 "
    "transformWithStateInPandas (typed ValueState, RocksDB store) when "
    "its protobuf runtime is present, else to applyInPandasWithState — "
    "same shared fold kernel. One fixed-width state row per key — "
    "O(users) state at any data scale.",
)
def q_stream_up_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.streaming.transform_state import (
        has_transform_with_state_runtime,
        running_series_stats,
    )

    load_table(spark, sf_dir, "events")
    if has_transform_with_state_runtime():
        # the only state-store provider transformWithState supports
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    stream = read_events_stream(spark, sf_dir)
    out = running_series_stats(stream.select("user_id", "ts", "value"))
    name = f"stream_streaks_{uuid.uuid4().hex[:8]}"
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
        raise TimeoutError("stream_up_streaks: run exceeded 300s")
    return spark.table(name)


@_register(
    "up_streak_batch",
    oracle="""
    WITH fe AS (
      -- finite-tick substream (round-6 sensor-garbage contract; see
      -- the Spark body / _finite_ticks)
      SELECT user_id, ts, value FROM events
      WHERE value IS NOT NULL AND isfinite(value)
    ), ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN value > lag(value)
                    OVER (PARTITION BY user_id ORDER BY ts)
                  THEN 1 ELSE 0 END AS up
      FROM fe
    ), isl AS (
      SELECT user_id, up,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts)
               - ROW_NUMBER() OVER (PARTITION BY user_id, up ORDER BY ts)
               AS grp
      FROM ordered
    ), streaks AS (
      SELECT user_id, COUNT(*) AS len
      FROM isl WHERE up = 1 GROUP BY user_id, grp
    ), best AS (
      SELECT user_id, MAX(len) AS best FROM streaks GROUP BY user_id
    )
    SELECT e.user_id, COUNT(*) AS n_events, MAX(e.value) AS max_value,
           COALESCE(ANY_VALUE(b.best), 0) AS best_up_streak
    FROM fe e LEFT JOIN best b ON e.user_id = b.user_id
    GROUP BY e.user_id ORDER BY e.user_id
    """,
    tags=("streaming", "window", "islands"),
    doc="batch twin of stream_up_streaks with a DuckDB oracle: longest "
    "consecutive up-move run per user via gaps-and-islands, plus "
    "count/max. The stream's final per-user row equals this query "
    "(tests/test_transform_state.py), anchoring the custom stateful "
    "operator's semantics to an oracle.",
)
def q_up_streak_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from stockpulse_spark.functions.nullsafe import not_finite

    # finite-tick substream (round-6 sensor-garbage contract, round-10
    # fuzz twin-diff finding): the pandas stream kernel cannot
    # represent the NULL/NaN distinction across the Arrow boundary and
    # JVM max/comparisons order NaN greatest — masking at ingestion is
    # the only semantics all three (kernel, this twin, the oracle) can
    # share; mirrored in the oracle WHERE and _finite_ticks
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .filter(F.col("value").isNotNull() & ~not_finite("value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    up = (
        F.when(F.col("value") > F.lag("value").over(w), 1).otherwise(0)
    )
    ordered = ev.select("user_id", "ts", "value", up.alias("up"))
    isl = ordered.withColumn(
        "grp",
        F.row_number().over(w)
        - F.row_number().over(
            Window.partitionBy("user_id", "up").orderBy("ts")
        ),
    )
    best = (
        isl.filter(F.col("up") == 1)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("best"))
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .join(F.broadcast(best), "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "max_value",
            F.coalesce(F.col("best"), F.lit(0)).alias("best_up_streak"),
        )
        .orderBy("user_id")
    )


@_register(
    "stream_dedup_within_watermark",
    oracle=None,  # state-eviction semantics — rows-only; key set equals
    # dedup_keys_batch (tests/test_streaming2.py)
    tags=("streaming", "dedup"),
    doc="dropDuplicatesWithinWatermark: unlike dropDuplicates (which "
    "keeps ALL keys' state forever), state for a key is evicted once "
    "the watermark passes it — the right primitive when duplicates "
    "arrive close together (retries, at-least-once brokers) and key "
    "cardinality is unbounded. Emits the key projection only, so the "
    "emitted set is deterministic (first-arrival payloads are not).",
)
def q_stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    load_table(spark, sf_dir, "events")
    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "ts"])
        .select("user_id", "ts")
    )
    name = f"stream_ddww_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream_dedup_within_watermark: exceeded 300s")
    return spark.table(name)


@_register(
    "dedup_keys_batch",
    oracle="SELECT DISTINCT user_id, ts FROM events",
    tags=("dedup",),
    doc="batch twin of stream_dedup_within_watermark: the distinct "
    "(user_id, ts) key set. For a bounded replay every duplicate "
    "arrives within the watermark, so the stream's emitted key set "
    "equals this exactly (tests/test_streaming2.py).",
)
def q_dedup_keys_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events").select("user_id", "ts").distinct()
    )
