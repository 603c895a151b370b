"""Time-bucket resampling (reference A10/T6: docs/preprocessing.md:19-33
— pandas `resample(freq).agg({open:first, high:max, low:min,
close:last, volume:sum})`, 5 min → 1H/1D/1W bars).

Spark shape: tumbling `window(ts, freq)` + one aggregation. The same
expression is valid under Structured Streaming with a watermark, so
batch and streaming resample share this code path.

first/last are made DETERMINISTIC with min_by/max_by over an explicit
ordering tuple — Spark's bare `first()` in an agg is
order-of-arrival-dependent, which would be flaky under AQE / different
partition counts (and wrong at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import max_by_nn, min_by_nn


def resample_ohlcv(
    df: DataFrame,
    freq: str,
    ts_col: str = "timestamp",
    partition_cols: list[str] = ("symbol",),
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    volume_col: str = "volume",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """5-min bars → coarser OHLCV bars per partition key.

    freq: any Spark window duration ("1 hour", "1 day", "1 week").
    Returns bucket_start + partition cols + open/high/low/close/volume.
    """
    order = F.struct(
        F.col(ts_col), *([F.col(tiebreak_col)] if tiebreak_col else [])
    )
    agg = (
        df.groupBy(*partition_cols, F.window(F.col(ts_col), freq).alias("__w"))
        .agg(
            min_by_nn(F.col(open_col), order).alias("open"),
            F.max(F.col(high_col)).alias("high"),
            F.min(F.col(low_col)).alias("low"),
            max_by_nn(F.col(close_col), order).alias("close"),
            F.sum(F.col(volume_col)).alias("volume"),
        )
        .withColumn("bucket_start", F.col("__w.start"))
        .drop("__w")
    )
    return agg.select("bucket_start", *partition_cols, "open", "high", "low", "close", "volume")
