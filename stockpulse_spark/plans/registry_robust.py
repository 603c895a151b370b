"""Robust / diagnostic statistics over the event series: Theil-Sen
trend, single-changepoint detection, and a multi-lag autocorrelation
profile.

Reference parity: the reference fits visual trendlines and eyeballs
regime changes on its dashboard charts (app/dashboard.py); these are the
estimator-grade versions — a median-of-slopes trend immune to the
outlier spikes the quality filters (operators/quality.py) otherwise
have to catch, an exact least-squares changepoint, and the ACF
profile that generalizes `hourly_count_autocorr` from lag 1 to a
1..12 correlogram.

All three are pure Column algebra (no Python), shaped for scale:
pair expansion happens in-row over per-entity collected arrays
(bounded by series length, never a corpus self-join), the
changepoint scan is two integer prefix-sum windows, and the ACF runs
on the HOURS x TYPES rollup, never the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, corr_nn, max_by_nn, min_by_nn

from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
      -- HAVING: an all-NULL day has no close and contributes neither
      -- a pair slope nor a residual (mirrored on the Spark side)
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
             last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS close
      FROM events GROUP BY 1, 2
      HAVING last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) IS NOT NULL
    ), dn AS (
      SELECT user_id, close,
             date_diff('day', DATE '1970-01-01', d) AS t
      FROM daily
    ), slopes AS (
      SELECT a.user_id,
             (b.close - a.close) / CAST(b.t - a.t AS DOUBLE) AS slope
      FROM dn a JOIN dn b
        ON a.user_id = b.user_id AND a.t < b.t
    ), fit AS (
      SELECT user_id, COUNT(*) AS n_pairs,
             quantile_cont(slope, 0.5) AS ts_slope
      FROM slopes GROUP BY user_id
    )
    SELECT d.user_id,
           COUNT(*) AS n_days,
           MAX(f.n_pairs) AS n_pairs,
           -- + 0.0 canonicalizes IEEE negative zero: DuckDB's ROUND
           -- of a tiny negative returns -0.0 where Spark's BigDecimal
           -- round returns +0.0 — equal values, different hash
           ROUND(MAX(f.ts_slope), 6) + 0.0 AS ts_slope,
           ROUND(quantile_cont(d.close - f.ts_slope * d.t, 0.5), 6) + 0.0
             AS ts_intercept
    FROM dn d JOIN fit f USING (user_id)
    GROUP BY d.user_id
    ORDER BY d.user_id
    """,
    tags=("robust", "trend", "agg"),
    doc="Theil-Sen robust trend per series over daily closes: slope = "
    "median of all pairwise slopes, intercept = median of (y - "
    "slope*t) — breakdown point 29%, unmoved by the price spikes "
    "that wreck OLS. ONE shuffle total: the O(days^2) pair set, its "
    "median, and the residual median all evaluate IN-ROW over each "
    "series' sorted (day, close) array (flatten/transform + "
    "array_sort medians) — the first cut exploded the slope multiset "
    "back through a second shuffle and went 16x at 10x data; this "
    "form measured 10x -> ~1x because per-series work never touches "
    "another exchange. The oracle states the same multiset as a "
    "within-user self-join with quantile_cont; the in-row median "
    "applies the identical (n-1)*0.5 interpolation to the identical "
    "multiset, so values agree bit-for-bit.",
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .agg(max_by_nn(nan_nn("value"), "ts").alias("close"))
        .filter(F.col("close").isNotNull())
    )
    dn = daily.select(
        "user_id",
        F.datediff("d", F.lit("1970-01-01")).alias("t"),
        "close",
    )
    g = dn.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "close"))).alias("s")
    )

    # exact interpolated median of a DOUBLE array, entirely in-row:
    # identical definition to percentile(x, 0.5)/quantile_cont
    def med(arr: str) -> str:
        srt = f"array_sort({arr})"
        n = f"size({arr})"
        return (
            f"IF({n} % 2 = 1, "
            f"element_at({srt}, CAST(({n} + 1) DIV 2 AS INT)), "
            f"(element_at({srt}, CAST({n} DIV 2 AS INT)) "
            f" + element_at({srt}, CAST({n} DIV 2 + 1 AS INT))) / 2.0)"
        )

    slopes = (
        "flatten(transform(s, (x, i) -> "
        "transform(slice(s, i + 2, size(s)), "
        "y -> (y.close - x.close) / CAST(y.t - x.t AS DOUBLE))))"
    )
    fit = (
        g.filter(F.size("s") >= 2)
        .withColumn("sl", F.expr(slopes))
        .withColumn("slope", F.expr(med("sl")))
        .withColumn(
            "res",
            F.expr("transform(s, e -> e.close - slope * e.t)"),
        )
    )
    return fit.select(
        "user_id",
        F.size("s").alias("n_days"),
        F.size("sl").cast("bigint").alias("n_pairs"),
        _r6(F.col("slope")).alias("ts_slope"),
        _r6(F.expr(med("res"))).alias("ts_intercept"),
    ).orderBy("user_id")


@_register(
    "changepoint_binseg",
    oracle="""
    WITH bars AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_start,
             CAST(round(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) * 100) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), pre AS (
      SELECT user_id, bucket_start,
             ROW_NUMBER() OVER w AS t,
             SUM(cents) OVER w AS s,
             SUM(cents * cents) OVER w AS s2,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             SUM(cents) OVER (PARTITION BY user_id) AS sn,
             SUM(cents * cents) OVER (PARTITION BY user_id) AS s2n
      FROM bars
      WINDOW w AS (PARTITION BY user_id ORDER BY bucket_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), cost AS (
      SELECT user_id, bucket_start, t, n,
             (CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / t)
             + (CAST(s2n - s2 AS DOUBLE)
                - CAST(sn - s AS DOUBLE) * CAST(sn - s AS DOUBLE)
                  / (n - t)) AS split_cost,
             CAST(s2n AS DOUBLE)
               - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / n
               AS base_cost
      FROM pre WHERE t < n
    ), best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY split_cost, t) AS rk
      FROM cost
    )
    SELECT user_id, n AS n_obs, t AS split_t,
           bucket_start AS split_end,
           ROUND(base_cost / 10000.0, 6) AS sse_before,
           ROUND(split_cost / 10000.0, 6) AS sse_after,
           ROUND((base_cost - split_cost) / 10000.0, 6) AS sse_reduction
    FROM best WHERE rk = 1
    ORDER BY user_id
    """,
    tags=("robust", "changepoint", "window"),
    doc="Exact single-changepoint detection (binary segmentation, "
    "first split) per series: the split minimizing left+right SSE of "
    "the hourly close series, found from two integer prefix-sum "
    "windows — O(n) per series, NOT the O(n^2) per-candidate rescan. "
    "Closes are integer cents so every cumulative sum is exact in "
    "both engines; costs then use the identical double expression "
    "(sum-of-squares minus mean correction), so the argmin order "
    "matches bit-for-bit and the (cost, t) tiebreak is deterministic. "
    "At 100 TB this is one window shuffle on the series key; repeated "
    "splits (full binary segmentation) recurse on the two halves "
    "with the same windows filtered to each segment.",
)
def q_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bars = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket_start")
    ).agg(
        F.round(max_by_nn(nan_nn("value"), "ts") * 100)
        .cast("bigint")
        .alias("cents")
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wa = Window.partitionBy("user_id")
    pre = bars.select(
        "user_id",
        "bucket_start",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("bucket_start"))
        .alias("t"),
        F.sum("cents").over(wc).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(wc).alias("s2"),
        F.count(F.lit(1)).over(wa).alias("n"),
        F.sum("cents").over(wa).alias("sn"),
        F.sum(F.col("cents") * F.col("cents")).over(wa).alias("s2n"),
    ).filter(F.col("t") < F.col("n"))
    sd = F.col("s").cast("double")
    s2d = F.col("s2").cast("double")
    cost = pre.select(
        "user_id",
        "bucket_start",
        "t",
        "n",
        (
            (s2d - sd * sd / F.col("t"))
            + (
                (F.col("s2n") - F.col("s2")).cast("double")
                - (F.col("sn") - F.col("s")).cast("double")
                * (F.col("sn") - F.col("s")).cast("double")
                / (F.col("n") - F.col("t"))
            )
        ).alias("split_cost"),
        (
            F.col("s2n").cast("double")
            - F.col("sn").cast("double")
            * F.col("sn").cast("double")
            / F.col("n")
        ).alias("base_cost"),
    )
    best = cost.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.col("split_cost").asc_nulls_last(), "t"
            )
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "user_id",
        F.col("n").alias("n_obs"),
        F.col("t").alias("split_t"),
        F.col("bucket_start").alias("split_end"),
        _r6(F.col("base_cost") / 10000.0).alias("sse_before"),
        _r6(F.col("split_cost") / 10000.0).alias("sse_after"),
        _r6((F.col("base_cost") - F.col("split_cost")) / 10000.0).alias(
            "sse_reduction"
        ),
    ).orderBy("user_id")


@_register(
    "acf_multilag",
    oracle="""
    WITH hc AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, CAST(n AS DOUBLE) AS n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY hr) AS rn
      FROM hc
    ), probe AS (
      SELECT i.event_type, i.rn + k.k AS rn, k.k,
             i.n AS n_prev
      FROM idx i CROSS JOIN (SELECT unnest(range(1, 13)) AS k) k
    )
    SELECT a.event_type, p.k AS lag,
           COUNT(*) AS n_pairs,
           -- total-corr restatement (functions/nullsafe.py corr_nn):
           -- a constant-count lag window (or a 1-pair group at the
           -- long lags) is NULL, not Spark's ANSI DIVIDE_BY_ZERO
           ROUND(covar_pop(a.n, p.n_prev)
                 / nullif(stddev_pop(a.n) * stddev_pop(p.n_prev), 0), 6)
             AS acf
    FROM idx a JOIN probe p
      ON a.event_type = p.event_type AND a.rn = p.rn
    GROUP BY a.event_type, p.k
    ORDER BY a.event_type, p.k
    """,
    tags=("robust", "timeseries", "agg"),
    doc="Autocorrelation profile (lags 1..12) of hourly event counts "
    "per type — the full correlogram behind `hourly_count_autocorr`'s "
    "single lag; a spike at lag 24 would betray daily seasonality, "
    "geometric decay an AR(1) load process. Counts collapse to the "
    "HOURS x TYPES rollup first (one partial-agg shuffle); every lag "
    "then comes from ONE equi-join — each row re-emits itself at "
    "rn+k for k in 1..12 (bounded 12x fanout on the metadata-sized "
    "rollup) instead of 12 window passes or a range join. Positional "
    "lag over observed hours, matching the lag-1 query's convention.",
)
def q_acf_multilag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    idx = hc.select(
        "event_type",
        F.col("n").cast("double").alias("n"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("hr"))
        .alias("rn"),
    )
    probe = idx.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(12))).alias("lag"),
        F.col("rn"),
        F.col("n").alias("n_prev"),
    ).select(
        "event_type",
        (F.col("rn") + F.col("lag")).alias("rn"),
        "lag",
        "n_prev",
    )
    return (
        idx.join(probe, ["event_type", "rn"])
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            _r6(corr_nn("n", "n_prev")).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


@_register(
    "isotonic_trend",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(round(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) * 100) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), ua AS (
      SELECT user_id,
             list(d ORDER BY d) AS ds,
             list(cents ORDER BY d) AS a,
             COUNT(*) AS na
      FROM daily GROUP BY user_id
    ), st AS (
      SELECT user_id, na, a, ds, 0 AS i,
             CAST([] AS STRUCT(s BIGINT, w BIGINT)[]) AS stack
      FROM ua
      UNION ALL
      SELECT user_id, na, a, ds,
             CASE WHEN viol THEN i ELSE i + 1 END AS i,
             CASE WHEN viol THEN
               list_append(stack[1:len(stack) - 2],
                 {'s': stack[len(stack) - 1].s + stack[len(stack)].s,
                  'w': stack[len(stack) - 1].w + stack[len(stack)].w})
             ELSE
               list_append(stack, {'s': a[i + 1], 'w': CAST(1 AS BIGINT)})
             END AS stack
      FROM (
        SELECT *,
               (len(stack) >= 2 AND
                stack[len(stack) - 1].s * stack[len(stack)].w
                  > stack[len(stack)].s * stack[len(stack) - 1].w) AS viol
        FROM st
      )
      WHERE viol OR i < na
    ), fin AS (
      SELECT user_id, ds,
             flatten(list_transform(stack, b ->
               list_transform(range(b.w),
                              x -> CAST(b.s AS DOUBLE) / b.w))) AS f,
             a
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY i DESC,
                                     len(stack)) AS rk
        FROM st WHERE i = na
      ) WHERE rk = 1
    )
    SELECT user_id,
           unnest(ds) AS d,
           ROUND(unnest(a) / 100.0, 6) AS close,
           ROUND(unnest(f) / 100.0, 6) AS iso_fit
    FROM fin
    ORDER BY user_id, d
    """,
    tags=("robust", "isotonic", "statespace"),
    doc="Isotonic (monotone non-decreasing) regression of daily "
    "closes per series via POOL-ADJACENT-VIOLATORS — the calibration "
    "fit Spark has no operator for (its ML variant is RDD-bound and "
    "approximate across partitions). The block stack folds IN-ROW: "
    "each push runs a bounded inner fold that merges violating "
    "adjacent blocks; violations compare s_prev*w_new > s_new*w_prev "
    "in INTEGER cents (cross-multiplied means), so the entire fit is "
    "exact integer arithmetic in both engines and only the final "
    "block-mean expansion divides. The oracle drives the identical "
    "push/merge state machine one transition per recursive-CTE step "
    "(merge steps don't consume a point; series finish at different "
    "depths like the DTW fold). Properties pinned by tests: output "
    "monotone, block-mean preservation, exact pooling of a planted "
    "V-shape.",
)
def q_isotonic_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.round(max_by_nn(nan_nn("value"), "ts") * 100).cast("bigint").alias("cents")
    )
    g = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("d", "cents"))).alias("s")
    )
    last = "element_at(st, size(st))"
    prev = "element_at(st, size(st) - 1)"
    merged = (
        f"array_append(slice(st, 1, size(st) - 2), "
        f"named_struct('s', {prev}.s + {last}.s, "
        f"'w', {prev}.w + {last}.w))"
    )
    inner = (
        "aggregate(sequence(1, size(push)), push, (st, k) -> "
        f"IF(size(st) >= 2 AND {prev}.s * {last}.w > {last}.s * {prev}.w, "
        f"{merged}, st))"
    )
    outer = (
        "aggregate(a, CAST(array() AS ARRAY<STRUCT<s: BIGINT, w: BIGINT>>), "
        "(acc, x) -> "
        + inner.replace(
            "push", "array_append(acc, named_struct('s', x, 'w', CAST(1 AS BIGINT)))"
        )
        + ")"
    )
    fit = (
        g.withColumn("a", F.expr("transform(s, e -> e.cents)"))
        .withColumn("stack", F.expr(outer))
        .withColumn(
            "f",
            F.expr(
                "flatten(transform(stack, b -> "
                "array_repeat(CAST(b.s AS DOUBLE) / b.w, CAST(b.w AS INT))))"
            ),
        )
    )
    z = fit.select(
        "user_id",
        F.explode(F.arrays_zip("s", "f")).alias("z"),
    )
    return z.select(
        "user_id",
        F.col("z.s.d").alias("d"),
        _r6(F.col("z.s.cents") / 100.0).alias("close"),
        _r6(F.col("z.f") / 100.0).alias("iso_fit"),
    ).orderBy("user_id", "d")
