"""Salted two-stage grouped top-k — the scale-correct form of
`row_number() OVER (PARTITION BY g ORDER BY ...) <= k` when the group
key has tiny cardinality (hot groups would otherwise funnel the whole
corpus through a handful of reducers).

Stage 1 ranks inside (group, salt) buckets — `buckets`x the reducers,
each seeing ~1/buckets of a hot group — and keeps k rows per bucket;
stage 2 ranks the surviving buckets*k-per-group candidates exactly.
The result is identical to the single-window form for ANY total
ordering (every true top-k row is necessarily in its bucket's top-k),
only the physical shape changes.

Shared by doc_weighted_sample_by_source (per-source A-ES sampling)
and hard_negative_mining (per-anchor contrastive negatives); pair it
with a deterministic salt (md5-derived, llmdata/hashing.py) so plans
stay reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    ordering: list[Column],
    k: int,
    salt: Column,
    rank_col: str = "rk",
    buckets: int = 16,
) -> DataFrame:
    """Append `rank_col` (1-based within each group under `ordering`)
    and keep only ranks <= k. `ordering` must be a TOTAL order within
    every group (include a tiebreak key) or stage-1 survivors are not
    well-defined. `salt` is any deterministic integer expression."""
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*ordering)
    survivors = (
        df.withColumn("__salt", salt % buckets)
        .withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= k)
        .drop("__salt", "__rk1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*ordering)
    return survivors.withColumn(
        rank_col, F.row_number().over(w2)
    ).filter(F.col(rank_col) <= k)
