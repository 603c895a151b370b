"""Skew-mitigation helpers for hot keys at scale.

At 100 TB a handful of symbols (or LSH buckets, or boilerplate dedup
groups) can dominate a shuffle. AQE's skew-join splitting handles the
JOIN case automatically (enabled in session.py); these helpers cover
the aggregation case and the explicit-salt join for engines/paths
where AQE can't see the skew (e.g. a first-stage aggregation with a
single giant group).

`salted_agg` = classic two-stage aggregation: scatter each key over
`n_salts` sub-keys, partially aggregate, then merge. Works for any
algebraic aggregate (decomposable into partial + merge) — sum, count,
min, max, avg (as sum+count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial_expr, merge_fn) per supported aggregate; avg is derived
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    aggs: {out_name: (fn, col)} with fn in {sum,count,min,max,avg}.
    Stage 1 groups on (keys…, salt) — the hot key's rows spread over
    n_salts reducers; stage 2 merges the partials per key. For uniform
    data this costs one extra tiny shuffle; for skewed data it removes
    the straggler entirely.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial_exprs = []
    merge_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partial_exprs += [
                F.sum(col).alias(f"__{out}_s"),
                F.count(col).alias(f"__{out}_c"),
            ]
            merge_exprs += [
                (F.sum(f"__{out}_s") / F.sum(f"__{out}_c")).alias(out)
            ]
        else:
            p, m = _ALGEBRAIC[fn]
            partial_exprs.append(p(col).alias(f"__{out}_p"))
            merge_exprs.append(m(f"__{out}_p").alias(out))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the large side, replicate the small side
    across every salt, join on (keys…, salt). Use when the small side
    is too big to broadcast but the large side has hot keys and AQE
    skew handling is unavailable (e.g. non-shuffle-join paths)."""
    l = large.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(s, on=[*keys, "__salt"], how=how).drop("__salt")
