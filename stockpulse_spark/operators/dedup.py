"""Deduplication operators (reference parity: W1 / A2 / A4 / T2).

The reference needs THREE dedup layers because its sink is append-only
and its checks are per-record RPCs (fetch gate stocks_pipeline.py:109-121,
per-message EXISTS bigquery_loader.py:118-140, periodic ROW_NUMBER
rewrite dedup_pipeline.py:24-111). In Spark the same guarantee is one
shuffle: a keyed window or `dropDuplicates`, and under streaming
`withWatermark + dropDuplicates` with bounded state.

Scale notes:
- `dedup_keep_latest` is one hash-shuffle on the key columns; with
  storage bucketed by the key it becomes shuffle-free.
- prefer `dropDuplicatesWithinWatermark` semantics in streams so state
  doesn't grow unboundedly (see streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Keep exactly one row per key, preferring the greatest order_cols.

    Reference: ROW_NUMBER() OVER (PARTITION BY symbol,timestamp ORDER BY
    timestamp DESC) + rn=1 (src/preprocessing/dedup_pipeline.py:31-53).
    One window shuffle; Catalyst plans it as a single hash exchange.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_report(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys occurring more than once, worst first.

    Reference diagnostic: GROUP BY timestamp,symbol HAVING COUNT(*)>1
    ORDER BY count DESC (docs/duplicates_in_bigquery.md:6-19).
    Map-side partial aggregation makes this cheap even on skewed keys.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("duplicate_count"))
        .filter(F.col("duplicate_count") > 1)
        .orderBy(F.col("duplicate_count").desc(), *keys)
    )


def new_keys_only(batch: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of `batch` whose key is absent from `existing`.

    Replaces the reference's per-record synchronous EXISTS lookup
    (src/loader/bigquery_loader.py:118-140) with ONE left-anti join —
    the idempotent-insert gate inside a foreachBatch sink. Spark
    broadcasts the smaller side automatically under AQE.
    """
    return batch.join(existing.select(*keys).distinct(), on=keys, how="left_anti")
