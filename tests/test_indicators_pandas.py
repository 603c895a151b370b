"""pandas-differential tests: the indicator library must reproduce the
reference's pandas formulas (app/dashboard.py:84-145) bit-close —
this pins the SURVEY §4 pitfall ledger (min_periods, ddof=1, recursive
ewm(adjust=False))."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from stockpulse_spark.functions.ema import add_ema, add_macd, add_macd_hof
from stockpulse_spark.functions.indicators import (
    IndicatorContext,
    add_stochastic,
    atr,
    bollinger,
    cma,
    momentum,
    roc,
    rsi,
    sma,
    sma_strict,
    vwap,
)

N = 300


@pytest.fixture(scope="module")
def ohlcv_pdf():
    rng = np.random.default_rng(7)
    rows = []
    for sym in ["AAPL", "TSLA"]:
        close = 100 + np.cumsum(rng.normal(0, 1, N))
        high = close + rng.uniform(0, 2, N)
        low = close - rng.uniform(0, 2, N)
        open_ = close + rng.normal(0, 0.5, N)
        vol = rng.integers(1, 10_000, N)
        ts = pd.date_range("2024-01-02 09:30", periods=N, freq="5min")
        rows.append(
            pd.DataFrame(
                dict(
                    timestamp=ts, symbol=sym, open=open_, high=high,
                    low=low, close=close, volume=vol,
                )
            )
        )
    return pd.concat(rows, ignore_index=True)


@pytest.fixture(scope="module")
def sdf(spark, ohlcv_pdf):
    return spark.createDataFrame(ohlcv_pdf)


@pytest.fixture(scope="module")
def ctx():
    return IndicatorContext(("symbol",), ("timestamp",), "close")


def _compare(sdf_out, pdf_expected, col, rtol=1e-9, atol=1e-9):
    got = (
        sdf_out.orderBy("symbol", "timestamp")
        .select(col)
        .toPandas()[col]
        .to_numpy()
    )
    exp = pdf_expected.to_numpy()
    assert len(got) == len(exp)
    np.testing.assert_allclose(got, exp, rtol=rtol, atol=atol, equal_nan=True)


def _ref(pdf, fn):
    """Apply a per-symbol pandas formula exactly as the reference does
    (one symbol per table), concatenated in sorted order."""
    out = []
    for _, g in pdf.sort_values(["symbol", "timestamp"]).groupby("symbol"):
        out.append(fn(g))
    return pd.concat(out)


def test_sma_min_periods_1(sdf, ohlcv_pdf, ctx):
    # reference W2: rolling(5, min_periods=1).mean()
    out = sdf.withColumn("x", sma(ctx, 5))
    exp = _ref(ohlcv_pdf, lambda g: g["close"].rolling(5, min_periods=1).mean())
    _compare(out, exp, "x")


def test_sma_strict(sdf, ohlcv_pdf, ctx):
    # reference W6: rolling(50).mean() → NaN for first 49
    out = sdf.withColumn("x", sma_strict(ctx, 50))
    exp = _ref(ohlcv_pdf, lambda g: g["close"].rolling(50).mean())
    _compare(out, exp, "x")


def test_cma(sdf, ohlcv_pdf, ctx):
    # reference W3: expanding().mean() ascending
    out = sdf.withColumn("x", cma(ctx))
    exp = _ref(ohlcv_pdf, lambda g: g["close"].expanding().mean())
    _compare(out, exp, "x")


def test_bollinger(sdf, ohlcv_pdf, ctx):
    # reference W5: SMA20 ± 2·rolling(20).std()  (sample std)
    mid, up, lo = bollinger(ctx, 20, 2.0)
    out = sdf.withColumn("up", up)

    def f(g):
        m = g["close"].rolling(20).mean()
        s = g["close"].rolling(20).std()
        return m + 2 * s

    _compare(out, _ref(ohlcv_pdf, f), "up")


def test_rsi(sdf, ohlcv_pdf, ctx):
    # reference W7 exact formula
    out = sdf.withColumn("x", rsi(ctx, 14))

    def f(g):
        delta = g["close"].diff()
        gain = delta.where(delta > 0, 0).rolling(14).mean()
        loss = (-delta.where(delta < 0, 0)).rolling(14).mean()
        return 100 - (100 / (1 + gain / loss))

    _compare(out, _ref(ohlcv_pdf, f), "x")


def test_atr(sdf, ohlcv_pdf, ctx):
    out = sdf.withColumn("x", atr(ctx, 14))

    def f(g):
        hl = g["high"] - g["low"]
        hc = (g["high"] - g["close"].shift()).abs()
        lc = (g["low"] - g["close"].shift()).abs()
        tr = pd.concat([hl, hc, lc], axis=1).max(axis=1)
        return tr.rolling(14).mean()

    _compare(out, _ref(ohlcv_pdf, f), "x")


def test_stochastic(sdf, ohlcv_pdf, ctx):
    out = add_stochastic(sdf, ctx, 14, 3)

    def f(g):
        lo = g["low"].rolling(14).min()
        hi = g["high"].rolling(14).max()
        k = 100 * (g["close"] - lo) / (hi - lo)
        return k.rolling(3).mean()

    _compare(out, _ref(ohlcv_pdf, f), "stoch_d")


def test_roc_momentum(sdf, ohlcv_pdf, ctx):
    out = sdf.withColumn("r", roc(ctx, 10)).withColumn("m", momentum(ctx, 10))
    _compare(out, _ref(ohlcv_pdf, lambda g: g["close"].pct_change(10) * 100), "r")
    _compare(out, _ref(ohlcv_pdf, lambda g: g["close"] - g["close"].shift(10)), "m")


def test_vwap(sdf, ohlcv_pdf, ctx):
    out = sdf.withColumn("x", vwap(ctx))

    def f(g):
        return (g["close"] * g["volume"]).cumsum() / g["volume"].cumsum()

    _compare(out, _ref(ohlcv_pdf, f), "x")


def test_ema_pandas_kernel(sdf, ohlcv_pdf):
    out = add_ema(sdf, {"ema12": 12}, ["symbol"], ["timestamp"], "close")
    exp = _ref(ohlcv_pdf, lambda g: g["close"].ewm(span=12, adjust=False).mean())
    _compare(out, exp, "ema12")


def test_macd_kernel_vs_hof(sdf, ohlcv_pdf):
    """applyInPandas kernel and JVM HOF fold agree with pandas and
    with each other (reference W8)."""
    k = add_macd(sdf, ["symbol"], ["timestamp"], "close")
    h = add_macd_hof(
        sdf.select("symbol", "timestamp", "close"), ["symbol"], "timestamp", "close"
    )

    def f(g):
        e12 = g["close"].ewm(span=12, adjust=False).mean()
        e26 = g["close"].ewm(span=26, adjust=False).mean()
        macd = e12 - e26
        return macd.ewm(span=9, adjust=False).mean()

    exp = _ref(ohlcv_pdf, f)
    _compare(k, exp, "macd_signal", rtol=1e-8)
    _compare(h, exp, "macd_signal", rtol=1e-8)
