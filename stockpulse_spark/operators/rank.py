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

from pyspark.sql import Column, DataFrame, Window
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


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division on BIGINT columns: subtracting the
    modulus first makes the dividend exactly divisible, so the double
    division is exact (quotient is representable) and the cast back
    is safe — no `div` expr string, no float-boundary flips."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """SQL ``NTILE(k)`` computed in closed form from a 1-based global
    rank and the frame's total row count — the distributed companion
    to :func:`with_global_rank`: ``ntile(k) OVER (ORDER BY ...)``
    funnels the whole frame through ONE WindowExec task, while
    ``ntile_from_rank(with_global_rank(df, ...), total, k)`` is pure
    per-row arithmetic over the range-partitioned rank.

    Semantics (pinned by tests/test_rank_property.py against Spark's
    own ntile): with N rows, the first ``N % k`` buckets hold
    ``ceil(N/k)`` rows, the rest ``floor(N/k)``; ``ceil(a/b)`` is
    ``(a+b-1) div b`` in exact integer arithmetic.  The ``when``
    guards the q=0 divisor (N < k: every rank falls in the first
    branch)."""
    q = _idiv(total, F.lit(k))
    r = total % k
    cut = r * (q + F.lit(1))
    return (
        F.when(rank <= cut, _idiv(rank + q, q + F.lit(1)))
        .otherwise(
            r + _idiv(rank - cut + q - F.lit(1), F.greatest(q, F.lit(1)))
        )
        .cast("int")
    )


def with_grouped_global_rank(
    df: DataFrame,
    group_cols: list[str],
    *order_cols: str,
    rank_col: str = "rnk",
) -> DataFrame:
    """Per-group 1-based row number ordered by `order_cols` WITHIN
    each `group_cols` group — the grouped companion to
    :func:`with_global_rank`.

    ``row_number() OVER (PARTITION BY g ORDER BY ...)`` parallelism is
    capped at the number of DISTINCT GROUPS: five event types means
    five tasks each sorting a fifth of the table, however large it
    grows.  Here the range partitioner orders by (group, order...), so
    a group's rows are contiguous across the partition sequence and
    a row's in-group rank is (group rows in earlier partitions) + its
    local (pid, group) row_number — the same prefix-sum decomposition,
    with the offsets window partitioned BY GROUP over the
    |partitions| x |groups| counts frame (metadata-sized).  Order
    keys accept the same ``-`` DESC NULLS LAST prefix; ordering is
    NULLS LAST throughout, matching the DuckDB oracles.
    """
    g_ordering = [F.col(c).asc_nulls_last() for c in group_cols]
    ordering = [
        F.col(c[1:]).desc_nulls_last()
        if c.startswith("-")
        else F.col(c).asc_nulls_last()
        for c in order_cols
    ]
    part = (
        df.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism,
            *g_ordering,
            *ordering,
        )
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = part.withColumn(
        "__lrk",
        F.row_number().over(
            Window.partitionBy("__pid", *group_cols).orderBy(*ordering)
        ),
    )
    offsets = (
        part.groupBy("__pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.partitionBy(*group_cols)
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(
            F.col("__pid").alias("__o_pid"),
            *[F.col(c).alias(f"__o_{c}") for c in group_cols],
            "__offset",
        )
    )
    # eqNullSafe on the group keys: a NULL group (fuzz corpora plant
    # NULL keys) is a real group to groupBy/row_number but would drop
    # out of a plain equi-join
    cond = F.col("__pid") == F.col("__o_pid")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__o_{c}"))
    return (
        local.join(F.broadcast(offsets), cond)
        .withColumn(rank_col, F.col("__offset") + F.col("__lrk"))
        .drop(
            "__pid",
            "__lrk",
            "__offset",
            "__o_pid",
            *[f"__o_{c}" for c in group_cols],
        )
    )


def with_grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "run_sum",
    inclusive: bool = True,
) -> DataFrame:
    """Per-group running SUM of `value_col` in `order_cols` order —
    the prefix-sum companion to :func:`with_grouped_global_rank`, for
    the token-packing / budget-sampling cumsums that a plain
    ``SUM() OVER (PARTITION BY source ORDER BY ...)`` computes with
    parallelism capped at |groups|.

    Same decomposition: range partition on (group, order) so groups
    are contiguous; a row's running sum is (sum of its group's values
    in earlier partitions) + its local running sum.  The offsets
    frame is |partitions| x |groups| rows; its join back is
    null-safe (NULL groups are real groups).  NULL values are skipped
    like SQL SUM, and the result is coalesced to 0 when no prior row
    exists (the ``coalesce(sum OVER, 0)`` idiom every call site
    used); `inclusive=False` gives the exclusive prefix
    (ROWS ... AND -1).  Ties on the full order key must be identical
    rows (or carry a tiebreak) for cross-engine determinism — the
    same contract the single-window form already had."""
    g_ordering = [F.col(c).asc_nulls_last() for c in group_cols]
    ordering = [
        F.col(c[1:]).desc_nulls_last()
        if c.startswith("-")
        else F.col(c).asc_nulls_last()
        for c in order_cols
    ]
    part = (
        df.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism,
            *g_ordering,
            *ordering,
        )
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    upper = 0 if inclusive else -1
    local = part.withColumn(
        "__lsum",
        F.coalesce(
            F.sum(value_col).over(
                Window.partitionBy("__pid", *group_cols)
                .orderBy(*ordering)
                .rowsBetween(Window.unboundedPreceding, upper)
            ),
            F.lit(0),
        ),
    )
    offsets = (
        part.groupBy("__pid", *group_cols)
        .agg(F.sum(value_col).alias("__psum"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__psum").over(
                    Window.partitionBy(*group_cols)
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(
            F.col("__pid").alias("__o_pid"),
            *[F.col(c).alias(f"__o_{c}") for c in group_cols],
            "__offset",
        )
    )
    cond = F.col("__pid") == F.col("__o_pid")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__o_{c}"))
    return (
        local.join(F.broadcast(offsets), cond)
        .withColumn(out_col, F.col("__offset") + F.col("__lsum"))
        .drop(
            "__pid",
            "__lsum",
            "__offset",
            "__o_pid",
            *[f"__o_{c}" for c in group_cols],
        )
    )
