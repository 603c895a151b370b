"""Stream-static dimension enrichment — the streaming join shape the
stream-stream attribution query doesn't cover: the live event stream
joins a STATIC dimension (customer market segment) that is simply
broadcast into every micro-batch, with no watermark or state on the
dimension side. This is the standard dashboard enrichment path: facts
arrive as a stream, dims are warehouse tables.

`stream_enriched_segment_counts` runs the real Structured Streaming
query (file replay, availableNow, memory sink; rows-only in the
driver gate); `enriched_segment_counts_batch` is its batch twin with a
DuckDB oracle, and tests/test_streaming3.py asserts the emitted sets
are equal — anchoring the streaming semantics to the oracle
transitively, the same recipe every other streaming pair here uses.
"""

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


def _enriched_agg(events: DataFrame, cust: DataFrame) -> DataFrame:
    dim = F.broadcast(
        cust.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return (
        events.join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum("value") * 1e6) / 1e6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "c_mktsegment",
            "n_events",
            "total_value",
        )
    )


@_register(
    "stream_enriched_segment_counts",
    oracle=None,  # watermark/append semantics — rows-only check; the
    # emitted set equals enriched_segment_counts_batch
    # (tests/test_streaming3.py)
    tags=("streaming", "join"),
    doc="stream-static broadcast enrichment: the event stream joins "
    "the static customer dimension on user_id (broadcast into every "
    "micro-batch — no state, no watermark on the dim side), then "
    "aggregates 1-hour tumbling windows per market segment under a "
    "2-hour watermark, availableNow -> memory sink. At scale the dim "
    "re-broadcasts per batch from the warehouse table, so dimension "
    "updates between batches are picked up automatically.",
)
def q_stream_enriched_segment_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    load_table(spark, sf_dir, "events")  # pin TZ + reader confs
    cust = load_table(spark, sf_dir, "customer")
    stream = read_events_stream(spark, sf_dir)
    agg = _enriched_agg(stream.withWatermark("ts", "2 hours"), cust)
    name = f"stream_enriched_{uuid.uuid4().hex[:8]}"
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
            "stream_enriched_segment_counts: run exceeded 300s"
        )
    return spark.table(name)


@_register(
    "enriched_segment_counts_batch",
    oracle="""
    WITH agg AS (
      SELECT CAST(to_timestamp(floor(epoch(e.ts) / 3600) * 3600)
                  AS TIMESTAMP) AS window_start,
             CAST(to_timestamp(floor(epoch(e.ts) / 3600) * 3600 + 3600)
                  AS TIMESTAMP) AS window_end,
             c.c_mktsegment,
             COUNT(*) AS n_events,
             ROUND(SUM(e.value) * 1e6) / 1e6 AS total_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1, 2, c.c_mktsegment
    ), wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS wm FROM events)
    SELECT a.* FROM agg a, wm WHERE a.window_end <= wm.wm
    """,
    tags=("streaming", "join", "agg"),
    doc="batch twin of stream_enriched_segment_counts with a DuckDB "
    "oracle: the same broadcast dim join and 1-hour tumbling "
    "aggregation, cut at the final watermark (window_end <= max(ts) "
    "- 2h), which is exactly the closed-window set append mode "
    "emits. The stream's rows equal this set (test_streaming3.py).",
)
def q_enriched_segment_counts_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    )
    return (
        _enriched_agg(ev, cust)
        .join(F.broadcast(wm))
        .filter(F.col("window_end") <= F.col("wm"))
        .drop("wm")
    )
