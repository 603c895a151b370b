"""Dynamic Time Warping — the alignment-tolerant series distance
Spark has no operator for.

Reference parity: the reference eyeballs 'which symbols move alike'
from overlaid dashboard charts (app/main.py compare view);
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

from stockpulse_spark.plans.registry import _r6, _register, _t

_INF = 10**15


@_register(
    "dtw_to_reference",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(round(arg_max(value, ts) * 100) AS BIGINT) * 2 AS c2
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
        (F.round(F.max_by("value", "ts") * 100).cast("bigint") * 2).alias(
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
    out = ua.join(F.broadcast(rb)).withColumn("dtw", F.expr(fold))
    return out.select(
        "user_id",
        F.size("a").cast("bigint").alias("n_user"),
        F.size("b").cast("bigint").alias("n_ref"),
        _r6(F.col("dtw") / 200.0).alias("dtw_distance"),
        _r6(F.col("dtw") / 200.0 / (F.size("a") + F.size("b"))).alias(
            "dtw_normalized"
        ),
    ).orderBy("user_id")
