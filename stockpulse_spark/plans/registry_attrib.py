"""Click->purchase attribution: the stream-stream interval join.

Reference parity: the reference's pipeline is single-stream (T1-T7);
joining two live streams (clicks and purchases of the same user within
an attribution window) is the canonical operation it cannot express
and Structured Streaming can — a watermarked stream-stream inner join
with an event-time range predicate. The batch twin carries the DuckDB
oracle; the streaming form is asserted row-identical to the twin in
tests/test_streaming.py (inner joins emit exactly the matched pairs,
watermarks only bound state), so the streaming semantics are
oracle-anchored, not just rows-counted.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _register, _t
from stockpulse_spark.sources.tables import load_table

_WINDOW_H = 6


def _attrib_pairs(
    clicks: DataFrame, purchases: DataFrame, how: str = "inner"
) -> DataFrame:
    """Matched (click, purchase) pairs: same user, click at or before
    the purchase, within the attribution window. Identical logic for
    the batch twin and the stream-stream join — the only difference is
    whether the inputs are static or streaming DataFrames. `how`
    flips the same plan to leftOuter for the purchase-preserving
    variant (registry_streaming5): unmatched purchases surface with
    NULL click columns."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {_WINDOW_H} HOURS")
        ),
        how,
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("latency_us"),
        (F.round(F.col("purchase_value") * 1e6) / 1e6).alias(
            "purchase_value"
        ),
    )


@_register(
    "purchase_attribution_batch",
    oracle=f"""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS latency_us,
           ROUND(p.value, 6) AS purchase_value
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL {_WINDOW_H} HOUR
    ORDER BY purchase_id, click_id
    """,
    tags=("streaming", "join"),
    doc=f"batch twin of stream_purchase_attribution: every click of "
    f"the same user within {_WINDOW_H}h before a purchase, with exact "
    "microsecond latency (epoch diffs, never seconds-casts). The "
    "range predicate rides a user_id equi-join — Spark shuffles both "
    "sides on user_id once and evaluates the interval filter inside "
    "the join, never a cartesian. At 100 TB the same plan holds: the "
    "equi-key carries the shuffle, and time-bucketing the join key "
    "(range_join_hour_stats pattern) bounds per-key fanout if one "
    "user dominates.",
)
def q_purchase_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pairs = _attrib_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return pairs.orderBy("purchase_id", "click_id")


@_register(
    "stream_purchase_attribution",
    oracle=None,  # stream-stream join semantics — rows-only check;
    # oracle-anchored transitively via purchase_attribution_batch
    # (row-for-row equality asserted in tests/test_streaming.py)
    tags=("streaming", "join"),
    doc="watermarked stream-stream INNER join: clicks and purchases "
    f"replay as two file streams, join on user within {_WINDOW_H}h "
    "before the purchase under 2h watermarks on BOTH sides (the "
    "range condition lets Spark derive state-eviction bounds — "
    "clicks older than watermark + window are purged, so state is "
    "bounded at any scale). availableNow -> memory sink. Inner joins "
    "emit exactly the matched pairs, so the emitted row set equals "
    "the oracle-checked batch twin row-for-row.",
)
def q_stream_purchase_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    def stream() -> DataFrame:
        from stockpulse_spark.sources.tables import read_events_stream

        return read_events_stream(spark, sf_dir).withWatermark(
            "ts", "2 hours"
        )

    pairs = _attrib_pairs(
        stream().filter(F.col("event_type") == "click"),
        stream().filter(F.col("event_type") == "purchase"),
    )
    name = f"stream_attrib_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_purchase_attribution: availableNow run exceeded 300s"
        )
    return spark.table(name)
