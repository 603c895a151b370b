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

from stockpulse_spark.plans.registry import _register
from stockpulse_spark.sources.tables import load_table


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

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicates(
        ["user_id", "ts"]
    )
    agg = (
        deduped.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.round(F.min_by("value", "ts") * 1e6).alias("__o"),
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
