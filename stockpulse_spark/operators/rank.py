"""Distributed global ranking — the scale-correct replacement for
`Window.orderBy(...)` with no partition key (which funnels every row
through ONE task).

Range partitions are totally ordered, so a row's global rank is
(rows in earlier partitions) + its local row_number: one range
repartition, a per-partition window, and a broadcast of cumulative
partition counts (the distributed prefix-sum decomposition also used
by `peak_concurrent_sessions_daily`). The repartition samples its
boundaries, so the partitioned frame is pinned with ONE
localCheckpoint — the local-rank and offset subtrees must agree on
pid assignment or ranks would shear.

Rank values are identical to the single-partition form for any
boundary choice; only the physical shape changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame, *order_cols: str, rank_col: str = "rnk"
) -> DataFrame:
    """Append a 1-based dense global row number ordered by
    `order_cols` (callers must make the order total — include a
    tiebreak key).  A ``-`` prefix on a name orders that key
    DESC NULLS LAST (matching DuckDB's DESC default) — prefer it over
    negating a numeric key, which silently flips NaN placement
    (``-NaN`` is still NaN, so negation sends NaN from rank 1 to
    rank N).

    Ordering is pinned NULLS LAST for both directions in both the
    range partitioner and the per-partition window: Spark's ASC
    default is NULLS FIRST but the DuckDB oracles
    (`ROW_NUMBER() ... ORDER BY`) default to NULLS LAST, and the two
    subtrees must agree with each other regardless.
    """
    ordering = [
        F.col(c[1:]).desc_nulls_last()
        if c.startswith("-")
        else F.col(c).asc_nulls_last()
        for c in order_cols
    ]
    part = (
        df.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism, *ordering
        )
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = part.withColumn(
        "__lrk",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(*ordering)
        ),
    )
    offsets = (
        part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.col("__offset") + F.col("__lrk"))
        .drop("__pid", "__lrk", "__offset")
    )
