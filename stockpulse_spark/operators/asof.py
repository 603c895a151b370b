"""As-of (point-in-time) join — an operator Spark lacks natively.

Joins each left row to the nearest right row per key, in a chosen
direction: the canonical tick-data operation (attach the prevailing
quote/EOD close to every trade/event). Not in the reference (SURVEY
§2.5 notes its absence) but core to any market-data engine. Full
pandas.merge_asof surface: direction backward/forward/nearest,
tolerance, allow_exact_matches.

Implementation is the union-and-fill shape — NOT a range self-join:
tag both sides, union, ONE window ordered by (ts, side) per key, and
fill the right side's payload onto left rows (`last` over the
preceding frame for backward, `first` over the following frame for
forward; `nearest` evaluates BOTH frames over the same sort and picks
the smaller time distance, backward winning ties). Cost: ONE shuffle
of |L|+|R| rows and one sort — versus the naive non-equi-join's
per-key cross product. This is the same plan a dedicated ASOF JOIN
physical operator (DuckDB's, Flink's temporal join) produces:
co-partition by key, merge by time. At 100 TB the shape holds: no
build-side explosion, state is one struct per partition-sort cursor.

Tie semantics at equal timestamps are controlled purely by the side
component of the sort key: with exact matches allowed, the right row
sorts into the frame that can see it (side 0 before side 1 for
backward, after for forward) — identical to DuckDB's inclusive
`ASOF JOIN ... ON l.ts >= r.ts` / `l.ts <= r.ts`, which the oracles
use. With allow_exact_matches=False the side order flips, pushing the
equal-ts right row out of the visible frame.

Degenerate-input contract (fuzz-pinned): right rows with a NULL join
key or NULL timestamp can never be "as of" anything and are dropped
inside the operator (DuckDB's equi+inequality join semantics); left
rows with a NULL timestamp keep their place but match nothing (their
payload is force-NULLed — Spark's NULLS FIRST sort would otherwise
let a forward fill see the whole partition).

Time distance for tolerance/nearest is computed in exact integer
microseconds (`unix_micros` ↔ DuckDB `epoch_us`) — no float epoch
round-trip that could flip a nearest decision between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    direction: str = "backward",
    tolerance: float | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach `payload_cols` from the matching
    right row on `on` keys, nearest in `direction` by timestamp:

    - "backward": latest right with right_ts <= left_ts (the default,
      pandas.merge_asof semantics);
    - "forward": earliest right with right_ts >= left_ts;
    - "nearest": whichever of the two is closer in absolute time,
      backward winning exact-distance ties.

    `tolerance` (seconds, fractional ok) discards a match farther than
    that from the left timestamp. `allow_exact_matches=False` makes
    the inequalities strict (unsupported for "nearest": the second-
    nearest fallback cannot share the single sort).

    The payload fills as ONE struct per right row (not one
    `last(..., ignorenulls)` per column): a NULL payload value on the
    matched right row is preserved as NULL — matching DuckDB ASOF
    JOIN — instead of silently falling back to an older non-null
    value. The matched right timestamp rides inside the struct for
    the tolerance/nearest arithmetic; expose it by listing `right_ts`
    in `payload_cols`.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and not allow_exact_matches:
        raise ValueError("allow_exact_matches=False is unsupported for direction='nearest'")

    lcols = left.columns
    p_struct_t = T.StructType(
        [T.StructField("__rts", right.schema[right_ts].dataType, True)]
        + [T.StructField(c, right.schema[c].dataType, True) for c in payload_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_struct_t).alias("__p"),
    )
    r_clean = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        r_clean = r_clean.filter(F.col(k).isNotNull())
    r = r_clean.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c)
          for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("__p"),
    )
    merged = l.unionByName(r)

    # Side sort order decides equal-ts visibility (see module doc).
    if direction == "backward":
        right_first = allow_exact_matches
    elif direction == "forward":
        right_first = not allow_exact_matches
    else:  # nearest: exact matches land in the backward frame
        right_first = True
    side = F.col("__side").asc() if right_first else F.col("__side").desc()
    w = Window.partitionBy(*on).orderBy(F.col("__ts").asc(), side)

    def within_tol(p: Column) -> Column:
        if tolerance is None:
            return p
        tol_us = int(round(tolerance * 1_000_000))
        d = F.abs(F.unix_micros(F.col("__ts")) - F.unix_micros(p["__rts"]))
        return F.when(d <= F.lit(tol_us), p)

    if direction in ("backward", "forward"):
        if direction == "backward":
            cand = F.last("__p", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        else:
            cand = F.first("__p", ignorenulls=True).over(
                w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
        # Stage the candidate ONCE: within_tol references it twice
        # (distance + value) and Catalyst does not dedup identical
        # window expressions.
        staged = merged.select(
            *lcols, "__side", "__ts", cand.alias("__cand")
        )
        chosen = within_tol(F.col("__cand"))
        # A NULL left timestamp matches nothing in either engine.
        chosen = F.when(F.col("__ts").isNotNull(), chosen)
        filled = staged.select(*lcols, "__side", chosen.alias("__p"))
    else:
        # Both frames read the SAME window sort: one shuffle, one
        # sort.  The candidates are PROJECTED ONCE before the pick —
        # referencing the window expressions inline in the distance
        # comparison would evaluate each first/last three times
        # (Catalyst does not dedup identical window expressions).
        staged = merged.select(
            *lcols,
            "__side",
            "__ts",
            within_tol(
                F.last("__p", ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
            ).alias("__bwd"),
            within_tol(
                F.first("__p", ignorenulls=True).over(
                    w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
                )
            ).alias("__fwd"),
        )
        bwd, fwd = F.col("__bwd"), F.col("__fwd")
        d_b = F.abs(F.unix_micros(F.col("__ts")) - F.unix_micros(bwd["__rts"]))
        d_f = F.abs(F.unix_micros(F.col("__ts")) - F.unix_micros(fwd["__rts"]))
        chosen = F.when(
            bwd.isNotNull() & (fwd.isNull() | (d_b <= d_f)), bwd
        ).otherwise(fwd)
        chosen = F.when(F.col("__ts").isNotNull(), chosen)
        filled = staged.select(*lcols, "__side", chosen.alias("__p"))
    out = (
        filled.filter(F.col("__side") == 1)
        .select(*lcols, *[F.col(f"__p.{c}").alias(c) for c in payload_cols],
                F.col("__p").isNotNull().alias("__matched"))
    )
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")
