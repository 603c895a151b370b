"""Round-11 optimization internals: the rewrites must be bit-exact
stand-ins for what they replaced.

- functions/localrel.values_df renders literal rows as one parsed
  VALUES LocalRelation; every value must round-trip BIT-identically to
  what createDataFrame produced (floats via repr, dates, strings with
  quotes, arrays, NULLs, booleans, big ints).
- functions/ema.ewm_adjust_false replaces the per-group pandas
  ewm(adjust=False).mean() call with a plain ndarray loop; it must
  match pandas to the LAST ULP on arbitrary series, including NaN
  gaps (ignore_na=False weight decay) and repeated values (the
  pandas kernel's y != v short-circuit skips the normalizing divide).
"""

from __future__ import annotations

import datetime as dt
import math
import struct

import numpy as np
import pandas as pd
import pytest

from stockpulse_spark.functions.ema import ewm_adjust_false
from stockpulse_spark.functions.localrel import values_df


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def test_values_df_bit_exact_roundtrip(spark):
    rows = [
        (1, 0.1, "plain", dt.date(2021, 1, 1), [0.123456789, -0.5], True),
        (2**40, 1e-300, "quote's", dt.date(1999, 12, 31), [1.0 / 3.0], False),
        (-7, -0.0, "", dt.date(2024, 2, 29), [], None),
        (0, float("nan"), "a,b|c", dt.date(1970, 1, 1), [2.0**-52], True),
        (5, float("inf"), "naïve✓", dt.date(2031, 7, 4), [-(2.0**52)], None),
    ]
    cols = ["i", "x", "s", "d", "arr", "b"]
    got = values_df(spark, rows, cols).collect()
    ref = spark.createDataFrame(
        rows, "i long, x double, s string, d date, arr array<double>, b boolean"
    ).collect()
    assert len(got) == len(ref) == len(rows)
    for g, r in zip(got, ref):
        assert g["i"] == r["i"]
        assert g["s"] == r["s"]
        assert g["d"] == r["d"]
        assert g["b"] == r["b"]
        # doubles compared by BITS (repr round-trip must be exact,
        # including -0.0, subnormal-adjacent, NaN and infinity)
        if r["x"] is None or math.isnan(r["x"]):
            assert g["x"] is None or math.isnan(g["x"])
        else:
            assert _bits(g["x"]) == _bits(r["x"])
        assert len(g["arr"]) == len(r["arr"])
        for a, b in zip(g["arr"], r["arr"]):
            assert _bits(a) == _bits(b)


def test_values_df_is_local_relation(spark):
    df = values_df(spark, [(1, "a")], ["i", "s"])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan  # no RDD, no Python tasks


@pytest.mark.parametrize("span", [9, 12, 26])
def test_ewm_adjust_false_matches_pandas_to_the_ulp(span):
    rng = np.random.RandomState(span)
    cases = [
        rng.randn(200) * 100,
        np.repeat(3.25, 50),  # constant series: the y != v short-circuit
        np.array([1.0]),
        np.array([]),
    ]
    # NaN-gap case: ignore_na=False weight decay through the gaps
    gap = rng.randn(100)
    gap[rng.rand(100) < 0.2] = np.nan
    gap[0] = np.nan  # leading NaN: y seeds at first observation
    cases.append(gap)
    alpha = 2.0 / (span + 1)
    for x in cases:
        ours = ewm_adjust_false(np.asarray(x, dtype=np.float64), alpha)
        ref = (
            pd.Series(x, dtype="float64")
            .ewm(span=span, adjust=False)
            .mean()
            .to_numpy()
        )
        assert ours.shape == ref.shape
        both_nan = np.isnan(ours) & np.isnan(ref)
        assert np.array_equal(ours[~both_nan], ref[~both_nan]), (
            span,
            np.nanmax(np.abs(ours - ref)),
        )
