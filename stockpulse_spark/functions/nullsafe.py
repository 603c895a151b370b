"""NULL-skipping positional aggregates.

Spark's `max_by(v, ts)` returns the value at the max ordering key even
when that value is NULL; DuckDB's `arg_max(v, ts)` skips rows whose
value is NULL and returns the last NON-NULL one. For OHLCV semantics
the skip-NULL form is the correct one — a NULL observation is not a
trade, so `close` is the last REAL price — and it is what every oracle
computes, so these helpers pin the Spark side to the same contract:
the ordering key is masked to NULL wherever the value is NULL, and a
NULL ordering key can never win min_by/max_by. A bucket whose values
are ALL NULL yields NULL in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def min_by_nn(value: Column | str, order: Column | str) -> Column:
    """Value at the smallest `order` among rows where value IS NOT
    NULL; ties on `order` break by the SMALLEST value.

    The struct key makes simultaneous observations (same user, same
    timestamp, different values — they exist at 100 TB) deterministic:
    without the tiebreak both engines pick an arbitrary tied row and
    disagree (found by hypothesis in tests/test_property_parity.py).
    Oracle twin: `first(v ORDER BY ts, v) FILTER (WHERE v IS NOT
    NULL)`.
    """
    v = _c(value)
    return F.min_by(v, F.when(v.isNotNull(), F.struct(_c(order), v)))


def max_by_nn(value: Column | str, order: Column | str) -> Column:
    """Value at the largest `order` among rows where value IS NOT
    NULL; ties on `order` break by the LARGEST value. Oracle twin:
    `last(v ORDER BY ts, v) FILTER (WHERE v IS NOT NULL)`."""
    v = _c(value)
    return F.max_by(v, F.when(v.isNotNull(), F.struct(_c(order), v)))


def corr_nn(x: Column | str, y: Column | str) -> Column:
    """Pearson correlation as a TOTAL aggregate: NULL — never a raise —
    on zero variance or <2 pairs.

    Spark's ANSI `corr` throws DIVIDE_BY_ZERO when either side is
    constant (a degenerate group a 100 TB corpus will contain), while
    DuckDB's `corr` returns NULL; restating BOTH engines as
    covar_pop / nullif(stddev_pop * stddev_pop, 0) over the
    pairwise-complete rows makes the aggregate total and the formula
    bit-identical. The masks reproduce `corr`'s pairwise deletion:
    a row where EITHER side is NULL contributes to no moment.
    Oracle twin:
    covar_pop(x, y) / nullif(stddev_pop(x) * stddev_pop(y), 0)
    with x, y pre-masked the same way (or NULL-free by construction).
    """
    cx, cy = _c(x), _c(y)
    both = cx.isNotNull() & cy.isNotNull()
    xm = F.when(both, cx)
    ym = F.when(both, cy)
    return F.try_divide(
        F.covar_pop(xm, ym),
        F.nullif(F.stddev_pop(xm) * F.stddev_pop(ym), F.lit(0.0)),
    )


def not_finite(x: Column | str) -> Column:
    """True where x is NaN or ±Infinity, FALSE where x is NULL — an
    exact drop-in for `F.isnan` (which is also false on NULL) with
    the infinity arms added. Oracle twin: `NOT isfinite(x)` guarded
    the same way its call sites guard NULL."""
    x = _c(x)
    return F.coalesce(
        F.isnan(x) | (F.abs(x) == float("inf")), F.lit(False)
    )


def nan_nn(x: Column | str) -> Column:
    """Non-finite -> NULL for a double measure (a NaN or ±Infinity
    observation is sensor garbage, not a value — an upstream divide
    emits both): the guard that keeps downstream integer snaps
    (`CAST(round(x*100) AS BIGINT)` raises CAST_OVERFLOW on NaN AND
    on Infinity under Spark ANSI, and a Conversion Error in DuckDB)
    and DuckDB's STDDEV/VAR family (which RAISES "out of range" on
    any non-finite input while Spark returns NaN) total. Oracle twin:
    `CASE WHEN NOT isfinite(x) THEN NULL ELSE x END`.

    History: round 6 closed the NaN class (42 -> 0 divergences);
    round 7's SPARK_GRAFT_FUZZ_INF census found 33 more from ±inf —
    widening the mask from nanvl to NOT-finite closed them with the
    same one-boundary fix.
    """
    x = _c(x)
    return F.when(~not_finite(x), x)
