"""Batch MERGE (upsert) semantics on plain parquet tables.

Spark's SQL MERGE INTO needs a transactional table format (Delta /
Iceberg), which this environment doesn't ship. The relational core of
MERGE is format-independent though: a keyed reconciliation of a target
snapshot with a source batch —

    matched     -> keep the winner (here: the newer row)
    not matched -> insert the source row

expressed as one full-outer join on the merge key plus a row chooser.
This is the same engine surface the reference exercises with its
daily "INSERT .. ON CONFLICT"-style refresh (bigquery_loader.py's
write-then-dedup cycle, dedup_pipeline.py:31-53): re-deliveries update,
new keys insert.

At 100 TB the full-outer join shuffles both sides on the merge key —
unavoidable for a general merge — but (a) AQE handles skewed keys,
(b) if the target is bucketed by the key (sinks.write_bucketed) the
target side's shuffle disappears, and (c) the chooser is pure Column
logic in codegen. The SQL-facing twin (MERGE INTO) binds to
Delta/Iceberg when those libs exist; this operator is the seam.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    order_by: str,
) -> DataFrame:
    """Upsert `source` into `target` on `keys`; on a key match the row
    with the greater `order_by` value wins (ties -> source, matching
    MERGE's WHEN MATCHED THEN UPDATE). Schemas must match.

    Returns the merged snapshot plus a `__merge_action` column
    ('insert' | 'update' | 'keep') so callers can audit the batch —
    drop it for the plain table."""
    if target.columns != source.columns:
        raise ValueError(
            f"merge_upsert: schema mismatch {target.columns} vs {source.columns}"
        )
    payload = [c for c in target.columns if c not in keys]
    t = target.select(
        *keys, F.struct(*[F.col(c) for c in payload]).alias("__t")
    )
    s = source.select(
        *keys, F.struct(*[F.col(c) for c in payload]).alias("__s")
    )
    j = t.join(s, on=list(keys), how="full_outer")

    src_wins: Column = F.col("__t").isNull() | (
        F.col("__s").isNotNull()
        & (F.col(f"__s.{order_by}") >= F.col(f"__t.{order_by}"))
    )
    action = (
        F.when(F.col("__t").isNull(), F.lit("insert"))
        .when(src_wins, F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    winner = F.when(src_wins, F.col("__s")).otherwise(F.col("__t"))
    return j.select(
        *keys,
        *[winner.getField(c).alias(c) for c in payload],
        action.alias("__merge_action"),
    )
