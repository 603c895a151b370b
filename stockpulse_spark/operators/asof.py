"""As-of (point-in-time) join — an operator Spark lacks natively.

Joins each left row to the most recent right row with
right_ts <= left_ts per key: the canonical tick-data operation
(attach the prevailing quote/EOD close to every trade/event). Not in
the reference (SURVEY §2.5 notes its absence) but core to any
market-data engine.

Implementation is the union-and-fill shape — NOT a range self-join:
tag both sides, union, one window ordered by (ts, side) per key, and
forward-fill the right side's payload onto left rows. Cost: ONE
shuffle of |L|+|R| rows and one sort — versus the naive
non-equi-join's per-key cross product. This is the same plan a
dedicated ASOF JOIN physical operator (DuckDB's, Flink's temporal
join) produces: co-partition by key, merge by time.

At equal timestamps the right row sorts FIRST (side 0 < side 1), so a
quote stamped exactly at the event time matches — identical to
DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach `payload_cols` from the latest right
    row with right[right_ts] <= left[left_ts], matching on `on`.

    The payload forward-fills as ONE struct per right row (not one
    `last(..., ignorenulls)` per column): a NULL payload value on the
    latest matching right row is preserved as NULL — matching DuckDB
    ASOF JOIN — instead of silently falling back to an older non-null
    value.
    """
    lcols = left.columns
    p_struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in payload_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_struct_t).alias("__p"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c)
          for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("__p"),
    )
    merged = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        *lcols,
        "__side",
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    out = (
        filled.filter(F.col("__side") == 1)
        .select(*lcols, *[F.col(f"__p.{c}").alias(c) for c in payload_cols],
                F.col("__p").isNotNull().alias("__matched"))
    )
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")
