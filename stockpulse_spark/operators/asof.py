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
    row with right[right_ts] <= left[left_ts], matching on `on`."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
          for c in payload_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c)
          for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
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
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        pred = None
        for c in payload_cols:
            p = F.col(c).isNotNull()
            pred = p if pred is None else (pred | p)
        out = out.filter(pred)
    return out
