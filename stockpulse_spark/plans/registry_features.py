"""Feature-engineering operators for tabular ML on event data:
leakage-free target encoding, weight-of-evidence binning, and
population-stability drift monitoring.

Reference parity: the reference feeds raw indicator columns straight
to charts (app/dashboard.py); a training pipeline needs the encode /
bin / monitor layer between the warehouse and the model. These are
the three canonical pieces: leave-one-out mean-target encoding (the
encoding that does not leak the row's own label), WOE/IV binning
(the credit-scoring standard for numeric->categorical evidence), and
PSI (the drift alarm every deployed model watches).

Determinism: targets are integer cents, so group sums are exact and
each encoded value is one double division; bins come from ntile over
a fully tie-broken order; the only libm is ln() inside WOE/PSI,
rounded at 6dp like every other ln-based query in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "loo_target_encoding",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(round((CASE WHEN NOT isfinite(value) THEN NULL ELSE value END) * 100) AS BIGINT) AS cents
      FROM events
    ), g AS (
      SELECT event_type, SUM(cents) AS s, COUNT(*) AS n
      FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.cents / 100.0, 6) AS value,
           CASE WHEN g.n > 1 THEN
             ROUND(CAST(g.s - e.cents AS DOUBLE)
                   / (g.n - 1) / 100.0, 6)
           END AS loo_enc
    FROM e JOIN g USING (event_type)
    ORDER BY e.event_id
    """,
    tags=("features", "ml", "agg"),
    doc="Leave-one-out mean-target encoding of event_type against "
    "the value target: each row's encoding is the group mean "
    "EXCLUDING the row itself, (S_g - y_i)/(n_g - 1) — the encoding "
    "that cannot leak a row's own label into its feature (plain "
    "group-mean encoding does, and the model memorizes it). One "
    "partial-agg shuffle builds the TYPE-sized (sum, count) table; "
    "it broadcasts back onto the scan, so the encode pass is "
    "scan-shaped at 100 TB. Integer-cents sums make every encoded "
    "value one exact double division.",
)
def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "event_type",
        F.round(nan_nn("value") * 100).cast("bigint").alias("cents"),
    )
    g = e.groupBy("event_type").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        e.join(F.broadcast(g), "event_type")
        .select(
            "event_id",
            "event_type",
            _r6(F.col("cents") / 100.0).alias("value"),
            F.when(
                F.col("n") > 1,
                _r6(
                    (F.col("s") - F.col("cents")).cast("double")
                    / (F.col("n") - 1)
                    / 100.0
                ),
            ).alias("loo_enc"),
        )
        .orderBy("event_id")
    )


@_register(
    "woe_binning",
    oracle="""
    WITH r AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rnk,
             COUNT(*) OVER () AS n_total
      FROM events
    ), e AS (
      SELECT value, pos,
             CAST(((rnk - 1) * 10) // n_total AS INT) + 1 AS bin
      FROM r
    ), b AS (
      SELECT bin,
             COUNT(*) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg,
             ROUND(MIN(value), 6) AS bin_lo,
             ROUND(MAX(value), 6) AS bin_hi
      FROM e GROUP BY bin
    ), t AS (
      SELECT SUM(n_pos) AS tp, SUM(n_neg) AS tn FROM b
    )
    SELECT b.bin, b.n, b.n_pos, b.n_neg, b.bin_lo, b.bin_hi,
           CASE WHEN b.n_pos > 0 AND b.n_neg > 0 THEN
             ROUND(ln((CAST(b.n_pos AS DOUBLE) / t.tp)
                      / (CAST(b.n_neg AS DOUBLE) / t.tn)), 6)
           END AS woe,
           CASE WHEN b.n_pos > 0 AND b.n_neg > 0 THEN
             ROUND((CAST(b.n_pos AS DOUBLE) / t.tp
                    - CAST(b.n_neg AS DOUBLE) / t.tn)
                   * ln((CAST(b.n_pos AS DOUBLE) / t.tp)
                        / (CAST(b.n_neg AS DOUBLE) / t.tn)), 6)
           END AS iv_term
    FROM b, t
    ORDER BY b.bin
    """,
    tags=("features", "ml", "window"),
    doc="Weight-of-evidence decile binning of value against the "
    "purchase label: WOE_b = ln((pos_b/pos)/(neg_b/neg)) per bin "
    "plus its information-value term — the credit-scoring transform "
    "that turns a numeric into monotone categorical evidence. Bins "
    "are equal-count deciles from an explicit rank formula "
    "(bin = (rnk-1)*10 div n + 1) over a fully tie-broken (value, "
    "event_id) order — stated identically in both engines, and the "
    "rank itself is DISTRIBUTED (operators/rank.py: range "
    "repartition + prefix-sum offsets), never a single-partition "
    "window. Per-bin counts are exact integers; only the final ln "
    "is floating point.",
)
def q_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.rank import with_global_rank

    ev = _t(spark, sf_dir, "events")
    ranked = with_global_rank(
        ev.select(
            "value",
            "event_id",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("pos"),
        ),
        "value",
        "event_id",
    )
    n_total = ranked.agg(F.count(F.lit(1)).alias("n_total"))
    e = ranked.join(F.broadcast(n_total)).select(
        "value",
        "pos",
        F.expr("CAST(((rnk - 1) * 10) DIV n_total AS INT) + 1").alias(
            "bin"
        ),
    )
    b = e.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("n_neg"),
        _r6(F.min("value")).alias("bin_lo"),
        _r6(F.max("value")).alias("bin_hi"),
    )
    t = b.agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn"))
    # WOE is defined only when the bin holds BOTH classes — a
    # pure bin would divide or log by zero (ANSI errors; caught by
    # the planted separating-feature test)
    both = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    pos_share = F.col("n_pos").cast("double") / F.col("tp")
    neg_share = F.col("n_neg").cast("double") / F.col("tn")
    woe = F.log(pos_share / neg_share)
    return (
        b.join(F.broadcast(t))
        .select(
            "bin",
            "n",
            "n_pos",
            "n_neg",
            "bin_lo",
            "bin_hi",
            F.when(both, _r6(woe)).alias("woe"),
            F.when(both, _r6((pos_share - neg_share) * woe)).alias(
                "iv_term"
            ),
        )
        .orderBy("bin")
    )


@_register(
    "psi_value_drift",
    oracle="""
    WITH cut AS (
      SELECT quantile_cont(epoch_us(ts), 0.5) AS mid FROM events
    ), e AS (
      SELECT e.event_type,
             CASE WHEN NOT isfinite(e.value) THEN NULL ELSE e.value END
               AS value,
             CASE WHEN epoch_us(e.ts) <= c.mid THEN 0 ELSE 1 END AS period
      FROM events e, cut c
    ), edges AS (
      -- edges snapped to micro-units (engine-independent bin
      -- membership at duplicated values; see the Spark twin)
      SELECT event_type,
             list_transform(
               quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
               q -> ROUND(q, 6)) AS qs
      FROM e WHERE period = 0 GROUP BY event_type
    ), binned AS (
      SELECT e.event_type, e.period,
             1 + len(list_filter(g.qs, q -> e.value > q)) AS bin
      FROM e JOIN edges g USING (event_type)
    ), counts AS (
      SELECT event_type, bin,
             1 + SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS c0,
             1 + SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS c1
      FROM binned GROUP BY event_type, bin
    ), tot AS (
      SELECT event_type, SUM(c0) AS t0, SUM(c1) AS t1
      FROM counts GROUP BY event_type
    )
    SELECT c.event_type,
           COUNT(*) AS n_bins,
           ROUND(SUM((CAST(c.c0 AS DOUBLE) / t.t0
                      - CAST(c.c1 AS DOUBLE) / t.t1)
                     * ln((CAST(c.c0 AS DOUBLE) / t.t0)
                          / (CAST(c.c1 AS DOUBLE) / t.t1))), 6) AS psi
    FROM counts c JOIN tot t USING (event_type)
    GROUP BY c.event_type
    ORDER BY c.event_type
    """,
    tags=("features", "ml", "drift", "agg"),
    doc="Population Stability Index of the value distribution per "
    "event type, first half of the stream (reference) vs second "
    "half (current): bins fixed on the REFERENCE deciles (the PSI "
    "convention — drift moves mass across frozen bins), Laplace +1 "
    "on counts so empty bins cannot blow up the log, PSI = "
    "sum((p_ref - p_cur) * ln(p_ref/p_cur)). The numeric twin of "
    "`corpus_drift_jsd`'s vocabulary drift: >0.2 is the standard "
    "retrain alarm. Decile edges are a TYPES-sized broadcast; "
    "binning is an in-row filter count over 9 edges, so the whole "
    "monitor is one scan + two metadata-sized rollups.",
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    cut = ev.agg(F.percentile(us, F.lit(0.5)).alias("mid"))
    e = ev.join(F.broadcast(cut)).select(
        "event_type",
        nan_nn("value").alias("value"),
        F.when(us <= F.col("mid"), 0).otherwise(1).alias("period"),
    )
    qs = [i / 10.0 for i in range(1, 10)]
    edges = (
        e.filter(F.col("period") == 0)
        .groupBy("event_type")
        .agg(
            # edges snapped to micro-units: interpolated deciles differ
            # between engines in the last ulp, and a duplicated value
            # sitting exactly ON an edge flips its bin (found by the
            # sf1 sweep, where every value repeats 10x)
            F.transform(
                F.percentile("value", F.array(*[F.lit(q) for q in qs])),
                lambda q: F.round(q, 6),
            ).alias("qs")
        )
    )
    binned = e.join(F.broadcast(edges), "event_type").select(
        "event_type",
        "period",
        (
            1 + F.expr("size(filter(qs, q -> value > q))")
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        (1 + F.sum(F.when(F.col("period") == 0, 1).otherwise(0))).alias(
            "c0"
        ),
        (1 + F.sum(F.when(F.col("period") == 1, 1).otherwise(0))).alias(
            "c1"
        ),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("c0").alias("t0"), F.sum("c1").alias("t1")
    )
    p0 = F.col("c0").cast("double") / F.col("t0")
    p1 = F.col("c1").cast("double") / F.col("t1")
    return (
        counts.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            _r6(F.sum((p0 - p1) * F.log(p0 / p1))).alias("psi"),
        )
        .orderBy("event_type")
    )
