"""Dynamic Time Warping — the alignment-tolerant series distance
Spark has no operator for.

Reference parity: the reference eyeballs 'which symbols move alike'
from overlaid dashboard charts (app/dashboard.py compare view);
`pairwise_return_corr` answers it for synchronized series, but
correlation collapses when two series trace the same shape shifted
or stretched in time. DTW is the standard remedy: the minimum-cost
monotone alignment between two series.

Shape: each user's daily-close series is aligned against ONE
reference series (the cross-sectional daily median) — the
classify-against-centroid form whose cost is linear in users, not
the all-pairs quadratic. The DP (na x nb <= ~900 cells here) runs
IN-ROW as a single linear-index fold over the collected series
array; per-user memory is two DP rows, never the matrix. At 100 TB
the refinement is the Sakoe-Chiba band (cap |i-j| <= r, dropping
cells to O(n*r)) — noted, not needed at this series length.

Determinism: costs are |integer - integer| in DOUBLE-CENTS (the
median of integer cents is a multiple of 0.5, so 2x makes it
integer), hence every DP cell is an exact BIGINT in both engines —
min/plus over integers cannot diverge, and the oracle's lockstep
recursive CTE replays the identical cell order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, max_by_nn, min_by_nn

from stockpulse_spark.plans.registry import _r6, _register, _t

_INF = 10**15


@_register(
    "dtw_to_reference",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(round(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) * 100) AS BIGINT) * 2 AS c2
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT d, CAST(round(quantile_cont(c2, 0.5)) AS BIGINT) AS m2
      FROM daily GROUP BY d
    ), ua AS (
      SELECT user_id, list(c2 ORDER BY d) AS a,
             COUNT(*) AS na
      FROM daily GROUP BY user_id
    ), rb AS (
      SELECT list(m2 ORDER BY d) AS b, COUNT(*) AS nb FROM med
    ), st AS (
      SELECT user_id, na, -1 AS k,
             list_transform(range(nb),
                            x -> CAST({_INF} AS BIGINT)) AS prev,
             CAST([] AS BIGINT[]) AS cur
      FROM ua, rb
      UNION ALL
      SELECT user_id, na, k, p AS prev,
             list_append(c0, cost + m) AS cur
      FROM (
        SELECT *, CASE WHEN i = 0 AND j = 0 THEN 0 ELSE least(
                 CASE WHEN i = 0 THEN {_INF} ELSE p[j + 1] END,
                 CASE WHEN j = 0 THEN {_INF} ELSE c0[j] END,
                 CASE WHEN i = 0 OR j = 0 THEN {_INF} ELSE p[j] END)
               END AS m
        FROM (
          SELECT *,
                 CASE WHEN j = 0 AND i > 0 THEN cur ELSE prev END AS p,
                 CASE WHEN j = 0 THEN CAST([] AS BIGINT[])
                      ELSE cur END AS c0,
                 abs(a[i + 1] - b[j + 1]) AS cost
          FROM (
            SELECT s.user_id, s.na, s.k + 1 AS k, u.a, r.b, r.nb,
                   CAST((s.k + 1) // r.nb AS INT) AS i,
                   CAST((s.k + 1) % r.nb AS INT) AS j,
                   s.prev, s.cur
            FROM st s JOIN ua u USING (user_id), rb r
            WHERE s.k + 1 < s.na * r.nb
          )
        )
      )
    )
    SELECT s.user_id, s.na AS n_user, r.nb AS n_ref,
           ROUND(s.cur[r.nb] / 200.0, 6) AS dtw_distance,
           ROUND(s.cur[r.nb] / 200.0 / (s.na + r.nb), 6)
             AS dtw_normalized
    FROM st s, rb r
    WHERE s.k = s.na * r.nb - 1
    ORDER BY s.user_id
    """,
    tags=("timeseries", "dtw", "statespace"),
    doc="DTW distance from every user's daily-close series to the "
    "cross-sectional daily-median reference series. The full DP "
    "evaluates as ONE in-row fold over a linear cell index (two-row "
    "frontier carried in a named_struct accumulator, the same "
    "bounded-series contract as the MACD/Holt folds); the oracle "
    "replays the identical cell order through a lockstep recursive "
    "CTE. All costs and cells are exact BIGINTs (double-cents make "
    "the median integral), so the two engines agree bit-for-bit. "
    "One shuffle to collect per-user series + one broadcast of the "
    "33-element reference; Sakoe-Chiba banding is the documented "
    "long-series refinement.",
)
def q_dtw_to_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        (F.round(max_by_nn(nan_nn("value"), "ts") * 100).cast("bigint") * 2).alias(
            "c2"
        )
    )
    med = daily.groupBy("d").agg(
        F.round(F.percentile("c2", F.lit(0.5))).cast("bigint").alias("m2")
    )
    ua = daily.groupBy("user_id").agg(
        F.expr("transform(array_sort(collect_list(struct(d, c2))), e -> e.c2)").alias(
            "a"
        )
    )
    rb = med.agg(
        F.expr("transform(array_sort(collect_list(struct(d, m2))), e -> e.m2)").alias(
            "b"
        )
    )
    # the lockstep fold: k walks na*nb cells row-major; the
    # accumulator carries the previous DP row and the current prefix
    i = "CAST(k DIV size(b) AS INT)"
    j = "CAST(k % size(b) AS INT)"
    p = f"IF({j} = 0 AND {i} > 0, acc.cur, acc.prev)"
    c0 = f"IF({j} = 0, CAST(array() AS ARRAY<BIGINT>), acc.cur)"
    cost = f"abs(element_at(a, {i} + 1) - element_at(b, {j} + 1))"
    m = (
        f"IF({i} = 0 AND {j} = 0, CAST(0 AS BIGINT), least("
        f"IF({i} = 0, {_INF}, element_at({p}, {j} + 1)), "
        f"IF({j} = 0, {_INF}, element_at({c0}, {j})), "
        f"IF({i} = 0 OR {j} = 0, {_INF}, element_at({p}, {j}))))"
    )
    fold = (
        "aggregate("
        "  sequence(0, size(a) * size(b) - 1), "
        "  named_struct("
        f"    'prev', transform(b, x -> CAST({_INF} AS BIGINT)), "
        "    'cur', CAST(array() AS ARRAY<BIGINT>)), "
        "  (acc, k) -> named_struct("
        f"    'prev', {p}, "
        f"    'cur', array_append({c0}, {cost} + {m})), "
        "  acc -> element_at(acc.cur, size(b)))"
    )
    # Spread the per-user DP before the fold projection (optimization
    # r11, the PQ/matryoshka class): the grouped series table is tiny
    # in BYTES, so AQE coalesces it to ~1 partition and the interpreted
    # na*nb fold — the actual cost, ~1k cells per user — runs in a
    # single task. Round-robin over defaultParallelism spreads the DP;
    # per-user results are row-local, so output is unchanged.
    out = (
        ua.repartition(spark.sparkContext.defaultParallelism)
        .join(F.broadcast(rb))
        .withColumn("dtw", F.expr(fold))
    )
    return out.select(
        "user_id",
        F.size("a").cast("bigint").alias("n_user"),
        F.size("b").cast("bigint").alias("n_ref"),
        _r6(F.col("dtw") / 200.0).alias("dtw_distance"),
        _r6(F.col("dtw") / 200.0 / (F.size("a") + F.size("b"))).alias(
            "dtw_normalized"
        ),
    ).orderBy("user_id")


# SAX breakpoints for alphabet size 4 (standard normal quartiles)
_SAX_BP = (-0.6745, 0.0, 0.6745)


@_register(
    "sax_motifs",
    oracle=f"""
    WITH bars AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(round(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) * 100) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT user_id, COUNT(*) AS n, SUM(cents) AS s,
             SUM(cents * cents) AS s2
      FROM bars GROUP BY user_id
      HAVING COUNT(*) >= 2
    ), frames AS (
      SELECT b.user_id, CAST(date_trunc('day', b.h) AS DATE) AS d,
             CAST(hour(b.h) // 8 AS INT) AS frame,
             SUM(b.cents) AS fs, COUNT(*) AS fn
      FROM bars b GROUP BY 1, 2, 3
    ), z AS (
      SELECT f.user_id, f.d, f.frame,
             (CAST(f.fs AS DOUBLE) / f.fn - CAST(t.s AS DOUBLE) / t.n)
             / sqrt((CAST(t.s2 AS DOUBLE) - CAST(t.s AS DOUBLE)
                     * CAST(t.s AS DOUBLE) / t.n) / (t.n - 1)) AS zz
      FROM frames f JOIN stats t USING (user_id)
      WHERE (CAST(t.s2 AS DOUBLE) - CAST(t.s AS DOUBLE)
             * CAST(t.s AS DOUBLE) / t.n) > 0
    ), words AS (
      SELECT user_id, d,
             string_agg(CASE WHEN zz < {_SAX_BP[0]} THEN 'a'
                             WHEN zz < {_SAX_BP[1]} THEN 'b'
                             WHEN zz < {_SAX_BP[2]} THEN 'c'
                             ELSE 'd' END, '' ORDER BY frame) AS word
      FROM z GROUP BY user_id, d
    )
    SELECT word, COUNT(*) AS n_days,
           COUNT(DISTINCT user_id) AS n_users
    FROM words GROUP BY word
    ORDER BY n_days DESC, word LIMIT 20
    """,
    tags=("timeseries", "sax", "text"),
    doc="SAX (Symbolic Aggregate approXimation) motif mining: each "
    "user-day's hourly closes compress to a 3-symbol word (8-hour "
    "PAA frames, z-normalized per series, quantized at the standard-"
    "normal quartile breakpoints a|b|c|d), and the corpus-wide motif "
    "histogram surfaces the recurring intraday shapes ('abd' = "
    "morning-low/evening-high). This is the discretization that "
    "turns similarity search over raw series into string ops at 100 "
    "TB. Determinism: frame sums and per-series moments are exact "
    "integer cents, so every z-score is the same double in both "
    "engines and quantization cannot disagree; two partial-agg "
    "shuffles (bars -> frames; words), user stats broadcast back.",
)
def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bars = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.round(max_by_nn(nan_nn("value"), "ts") * 100).cast("bigint").alias("cents")
    )
    stats = (
        bars.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    frames = bars.groupBy(
        "user_id",
        F.date_trunc("day", "h").cast("date").alias("d"),
        (F.hour("h").cast("int") / 8).cast("int").alias("frame"),
    ).agg(F.sum("cents").alias("fs"), F.count(F.lit(1)).alias("fn"))
    sd = F.col("s").cast("double")
    var_num = F.col("s2").cast("double") - sd * sd / F.col("n")
    z = (
        frames.join(F.broadcast(stats), "user_id")
        .filter(var_num > 0)
        .select(
            "user_id",
            "d",
            "frame",
            (
                (F.col("fs").cast("double") / F.col("fn") - sd / F.col("n"))
                / F.sqrt(var_num / (F.col("n") - 1))
            ).alias("zz"),
        )
    )
    sym = (
        F.when(F.col("zz") < _SAX_BP[0], "a")
        .when(F.col("zz") < _SAX_BP[1], "b")
        .when(F.col("zz") < _SAX_BP[2], "c")
        .otherwise("d")
    )
    words = (
        z.select("user_id", "d", "frame", sym.alias("sym"))
        .groupBy("user_id", "d")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(frame, sym))), e -> e.sym), '')"
            ).alias("word")
        )
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_days"), "word")
        .limit(20)
    )
