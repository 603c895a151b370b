"""Indicator expression library — pure Column builders (reference W2-W13).

The reference computes every indicator imperatively in pandas, chart by
chart (app/dashboard.py:84-145). Here each indicator is a function
returning a Column over a shared window context, so ONE `.select()` can
add twenty indicators and Catalyst collapses them into a minimal number
of window shuffles (all windows share the same partitioning → one
exchange, one sort).

pandas-semantics pitfalls encoded here (SURVEY §4 ledger):
- pandas `rolling(N)` defaults to min_periods=N → NaN for the first
  N-1 rows. Spark frames shrink at partition start instead, so the
  strict variants null-out under-full frames with a count guard.
- the reference's ma5/cma use min_periods=1 explicitly → plain
  shrinking frames match.
- pandas `.std()` is SAMPLE std (ddof=1) → stddev_samp.
- `ewm(adjust=False)` (EMA/MACD) is recursive — no closed-form window
  equivalent; see functions/ema.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import max_by_nn, min_by_nn
from pyspark.sql.window import WindowSpec


@dataclass(frozen=True)
class IndicatorContext:
    """Partitioning/ordering shared by a family of indicator columns.

    partition_cols: series key (e.g. ["symbol"] or ["symbol", "date"])
    order_cols: time order within the series (must be deterministic —
        add a tiebreak column if the timestamp can repeat).
    value: the measure column name (e.g. "close").
    """

    partition_cols: tuple[str, ...]
    order_cols: tuple[str, ...]
    value: str = "close"

    def w(self) -> WindowSpec:
        return Window.partitionBy(*self.partition_cols).orderBy(*self.order_cols)

    def rows(self, n: int) -> WindowSpec:
        """Trailing frame of n rows (current + n-1 preceding)."""
        return self.w().rowsBetween(-(n - 1), 0)

    def cum(self) -> WindowSpec:
        return self.w().rowsBetween(Window.unboundedPreceding, 0)

    def vcol(self) -> Column:
        return F.col(self.value)


def sma(ctx: IndicatorContext, n: int, col: str | None = None) -> Column:
    """Rolling mean, min_periods=1 (reference W2 "moving_average":
    src/preprocessing/data_preprocessor.py:63-65)."""
    return F.avg(F.col(col or ctx.value)).over(ctx.rows(n))


def sma_strict(ctx: IndicatorContext, n: int, col: str | None = None) -> Column:
    """Rolling mean, pandas default min_periods=N (reference W6 SMA50/
    SMA200, app/dashboard.py:104-105): NULL until the frame is full."""
    c = F.col(col or ctx.value)
    frame = ctx.rows(n)
    return F.when(F.count(c).over(frame) >= n, F.avg(c).over(frame))


def cma(ctx: IndicatorContext, col: str | None = None) -> Column:
    """Expanding (cumulative) mean in ascending time order (reference
    W3 "cumulative_average": data_preprocessor.py:68-70 — the
    double-reversal there is just ascending expanding mean)."""
    return F.avg(F.col(col or ctx.value)).over(ctx.cum())


def returns_pct(ctx: IndicatorContext, periods: int = 1, col: str | None = None) -> Column:
    """pct_change()*100 (reference W13: docs/preprocessing.md:50)."""
    c = F.col(col or ctx.value)
    prev = F.lag(c, periods).over(ctx.w())
    return (c - prev) / prev * 100.0


def volatility(ctx: IndicatorContext, n: int = 20, col: str | None = None) -> Column:
    """rolling(n).std() of returns, sample std, strict min_periods
    (reference W13: docs/preprocessing.md:56-58)."""
    c = F.col(col or ctx.value)
    prev = F.lag(c, 1).over(ctx.w())
    ret = (c - prev) / prev * 100.0
    # strict window over a derived column needs the column materialized
    # first in practice; callers use two selects (see plans/registry).
    frame = ctx.rows(n)
    return F.when(F.count(ret).over(frame) >= n, F.stddev_samp(ret).over(frame))


def bollinger(
    ctx: IndicatorContext, n: int = 20, k: float = 2.0, col: str | None = None
) -> tuple[Column, Column, Column]:
    """(middle, upper, lower) = SMA_n, SMA ± k·rolling sample std
    (reference W5: app/dashboard.py:97-101; pandas rolling(20) strict)."""
    c = F.col(col or ctx.value)
    frame = ctx.rows(n)
    full = F.count(c).over(frame) >= n
    mid = F.when(full, F.avg(c).over(frame))
    sd = F.when(full, F.stddev_samp(c).over(frame))
    return mid, mid + k * sd, mid - k * sd


def rsi(ctx: IndicatorContext, n: int = 14, col: str | None = None) -> Column:
    """RSI via simple rolling means of clipped deltas (reference W7:
    app/dashboard.py:107-112 — note the reference uses SMA of
    gains/losses, not Wilder smoothing; replicate exactly).

    pandas: delta=diff(); gain=delta.where(delta>0, 0).rolling(14)
    .mean(); loss analogous; 100-100/(1+g/l). NOTE `.where(delta>0, 0)`
    maps the first NaN delta to 0, so the rolling window is already
    full at row n-1 — the guard must count the CLIPPED series (never
    null: greatest() ignores the null lag), not the deltas.
    """
    c = F.col(col or ctx.value)
    delta = c - F.lag(c, 1).over(ctx.w())
    gain = F.greatest(delta, F.lit(0.0))
    loss = F.greatest(-delta, F.lit(0.0))
    frame = ctx.rows(n)
    full = F.count(gain).over(frame) >= n
    avg_gain = F.when(full, F.avg(gain).over(frame))
    avg_loss = F.when(full, F.avg(loss).over(frame))
    # pandas float semantics on an all-gain window: g/0 = inf → RSI
    # 100; 0/0 = NaN → NaN. Spark ANSI division would instead raise,
    # so the zero-loss cases are made explicit.
    return (
        F.when(avg_loss == 0.0, F.when(avg_gain > 0.0, F.lit(100.0)))
        .otherwise(100.0 - 100.0 / (1.0 + avg_gain / avg_loss))
    )


def atr(
    ctx: IndicatorContext,
    n: int = 14,
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> Column:
    """Average True Range (reference W9: app/dashboard.py:120-126).
    TR = max(h-l, |h-prev_c|, |l-prev_c|); ATR = rolling(n).mean(TR)."""
    h, l, c = F.col(high), F.col(low), F.col(close)
    pc = F.lag(c, 1).over(ctx.w())
    tr = F.greatest(h - l, F.abs(h - pc), F.abs(l - pc))
    frame = ctx.rows(n)
    return F.when(F.count(tr).over(frame) >= n, F.avg(tr).over(frame))


def stochastic(
    ctx: IndicatorContext,
    n: int = 14,
    d: int = 3,
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> tuple[Column, Column]:
    """%K / %D oscillator (reference W10: app/dashboard.py:128-132).
    %K = 100·(close − min_n(low)) / (max_n(high) − min_n(low));
    %D = rolling(d).mean(%K). Strict frames like pandas.
    """
    frame = ctx.rows(n)
    full = F.count(F.col(low)).over(frame) >= n
    lo = F.when(full, F.min(F.col(low)).over(frame))
    hi = F.when(full, F.max(F.col(high)).over(frame))
    k = 100.0 * (F.col(close) - lo) / (hi - lo)
    return k, None  # %D computed on materialized %K — see add_stochastic


def add_stochastic(
    df: DataFrame,
    ctx: IndicatorContext,
    n: int = 14,
    d: int = 3,
    high: str = "high",
    low: str = "low",
    close: str = "close",
    k_name: str = "stoch_k",
    d_name: str = "stoch_d",
) -> DataFrame:
    k, _ = stochastic(ctx, n, d, high, low, close)
    out = df.withColumn(k_name, k)
    frame = ctx.rows(d)
    kd = F.when(
        F.count(k_name).over(frame) >= d, F.avg(k_name).over(frame)
    )
    return out.withColumn(d_name, kd)


def roc(ctx: IndicatorContext, n: int = 10, col: str | None = None) -> Column:
    """Rate of change: pct_change(n)*100 (reference W11:
    app/dashboard.py:502-503)."""
    c = F.col(col or ctx.value)
    prev = F.lag(c, n).over(ctx.w())
    return (c - prev) / prev * 100.0


def momentum(ctx: IndicatorContext, n: int = 10, col: str | None = None) -> Column:
    """close − close.shift(n) (reference W11: app/dashboard.py:504)."""
    c = F.col(col or ctx.value)
    return c - F.lag(c, n).over(ctx.w())


def vwap(
    ctx: IndicatorContext, price: str = "close", volume: str = "volume"
) -> Column:
    """Cumulative VWAP over the loaded range (reference W12:
    app/dashboard.py:377): cumsum(v·p)/cumsum(v)."""
    p, v = F.col(price), F.col(volume)
    w = ctx.cum()
    return F.sum(p * v).over(w) / F.sum(v).over(w)


def eod_rolling_mean_join(
    df: DataFrame,
    n: int = 5,
    partition_col: str = "symbol",
    date_col: str = "date",
    order_cols: tuple[str, ...] = ("timestamp",),
    close: str = "close",
    out_name: str = "eod_ma5",
) -> DataFrame:
    """EOD close per (symbol, date) → n-day rolling mean → broadcast
    LEFT-JOIN back onto every intraday row (reference W4+A5+J1:
    preprocessing_pipeline.py:163-174).

    The EOD dimension is tiny relative to the fact (1 row per
    symbol-day vs ~78 intraday bars) → explicit broadcast hash join, no
    shuffle of the fact table.
    """
    last_order = F.struct(*[F.col(c) for c in order_cols])
    eod = (
        df.groupBy(partition_col, date_col)
        .agg(max_by_nn(F.col(close), last_order).alias("__eod_close"))
    )
    w = (
        Window.partitionBy(partition_col)
        .orderBy(date_col)
        .rowsBetween(-(n - 1), 0)
    )
    eod = eod.withColumn(out_name, F.avg("__eod_close").over(w)).drop("__eod_close")
    return df.join(F.broadcast(eod), on=[partition_col, date_col], how="left")
