"""Flagship pipeline — the reference's end-to-end dataflow as ONE
declarative Spark plan.

Reference path (SURVEY §3.1/§3.3): raw bars → quality clean →
dedup → per-(series, day) moving/cumulative averages → resample →
indicators. Here: events parquet → clean_bars-style gate →
dedup_keep_latest → ma5/cma window columns → hourly OHLCV bars →
SMA/RSI/VWAP indicator columns. Catalyst fuses the filter into the
scan and shares the (user_id, date)-partitioned window exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.indicators import (
    IndicatorContext,
    atr,
    bollinger,
    rsi,
    sma,
    vwap,
)
from stockpulse_spark.operators.dedup import dedup_keep_latest
from stockpulse_spark.operators.resample import resample_ohlcv
from stockpulse_spark.sources.tables import load_table


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clean = ev.na.drop(subset=["ts", "user_id", "value"]).filter(F.col("value") > 0)
    deduped = dedup_keep_latest(clean, keys=["user_id", "ts"], order_cols=["event_id"])

    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts")
    enriched = deduped.select(
        "*",
        F.avg("value").over(w.rowsBetween(-4, 0)).alias("moving_average"),
        F.avg("value")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cumulative_average"),
    )

    bars = resample_ohlcv(
        enriched.withColumnRenamed("value", "close")
        .withColumn("open", F.col("close"))
        .withColumn("high", F.col("close"))
        .withColumn("low", F.col("close"))
        .withColumn("volume", F.lit(1).cast("long")),
        freq="1 hour",
        ts_col="ts",
        partition_cols=["user_id"],
    )

    ctx = IndicatorContext(("user_id",), ("bucket_start",), "close")
    mid, up, lo = bollinger(ctx, 20)
    return bars.select(
        "*",
        sma(ctx, 5).alias("sma5"),
        rsi(ctx, 14).alias("rsi14"),
        vwap(ctx).alias("vwap"),
        mid.alias("bb_mid"),
        up.alias("bb_upper"),
        lo.alias("bb_lower"),
        atr(ctx, 14).alias("atr14"),
    )
