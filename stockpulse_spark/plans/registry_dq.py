"""Declarative data-quality expectation suite — the contract-check
layer a warehouse runs before publishing a table.

Reference parity: the reference validates frames ad hoc before
writing (src/loader/bigquery_loader.py required-column and dtype
checks, operators/quality.py re-expresses them); this operator turns
those checks into a Great-Expectations-style DECLARATIVE suite
evaluated in one plan: each rule reports checked/violation counts
and a pass flag, so the pipeline can gate a publish on `all(passed)`
without a second scan.

Scale: every row-level rule is a conditional aggregate inside ONE
scan of the fact table (Catalyst collapses the rule set into a
single Aggregate — the same one-scan multi-stat shape
`table_profile_orders` pins with a plan test); uniqueness rides the
same pass via count vs approx-free exact distinct; the one rule
needing a second relation (FK integrity) is a broadcast anti-join
whose dim side is the small table. Adding a rule adds a column, not
a pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _register, _t

_DATE_LO, _DATE_HI = "1990-01-01", "2005-12-31"


@_register(
    "dq_expectation_suite",
    oracle=f"""
    WITH base AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_key_null,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_cust_null,
             SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                 THEN 1 ELSE 0 END) AS v_price,
             SUM(CASE WHEN o_orderdate IS NULL
                      OR o_orderdate < DATE '{_DATE_LO}'
                      OR o_orderdate > DATE '{_DATE_HI}'
                 THEN 1 ELSE 0 END) AS v_date,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_dup_key
      FROM orders
    ), fk AS (
      SELECT COUNT(*) AS v_fk
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    ), rules AS (
      SELECT 'orderkey_not_null' AS rule, n, v_key_null AS violations FROM base
      UNION ALL
      SELECT 'custkey_not_null', n, v_cust_null FROM base
      UNION ALL
      SELECT 'totalprice_positive', n, v_price FROM base
      UNION ALL
      SELECT 'orderdate_in_range', n, v_date FROM base
      UNION ALL
      SELECT 'orderkey_unique', n, v_dup_key FROM base
      UNION ALL
      SELECT 'custkey_fk_exists', (SELECT n FROM base), v_fk FROM fk
    )
    SELECT rule, CAST(n AS BIGINT) AS n_checked,
           CAST(violations AS BIGINT) AS n_violations,
           -- COALESCE: zero rows checked is a vacuous PASS on both
           -- engines, not a NULL boolean (empty-corpus sweep)
           COALESCE(violations, 0) = 0 AS passed
    FROM rules ORDER BY rule
    """,
    tags=("quality", "warehouse", "agg"),
    doc="Declarative expectation suite over the orders table: "
    "not-null, positive-amount, date-range, primary-key-uniqueness "
    "and FK-integrity rules evaluated together, one row per rule "
    "with checked/violation counts and a pass flag. All row-level "
    "rules fold into ONE Aggregate over ONE scan (conditional "
    "sums + exact distinct); FK integrity is a broadcast anti-join "
    "against the customer dim. This is the publish gate shape: at "
    "100 TB the suite costs the same single pass as any one of its "
    "rules, and `all(passed)` decides the promotion.",
)
def q_dq_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    viol = F.when
    base = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            viol(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("v_key_null"),
        F.sum(
            viol(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("v_cust_null"),
        F.sum(
            viol(
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") <= 0),
                1,
            ).otherwise(0)
        ).alias("v_price"),
        F.sum(
            viol(
                F.col("o_orderdate").isNull()
                | (F.col("o_orderdate") < F.lit(_DATE_LO).cast("date"))
                | (F.col("o_orderdate") > F.lit(_DATE_HI).cast("date")),
                1,
            ).otherwise(0)
        ).alias("v_date"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))
        ).alias("v_dup_key"),
    )
    fk = (
        o.join(
            F.broadcast(cust.select("c_custkey")),
            o["o_custkey"] == cust["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v_fk"))
    )
    # ONE evaluation of the wide aggregate (a union of per-rule
    # selects would re-scan orders once per rule — the plan test
    # counts scans); stack() unpivots the single row into rule rows
    base = base.localCheckpoint(eager=False)
    rules = base.select(
        F.expr(
            "stack(5, "
            "'orderkey_not_null', v_key_null, "
            "'custkey_not_null', v_cust_null, "
            "'totalprice_positive', v_price, "
            "'orderdate_in_range', v_date, "
            "'orderkey_unique', v_dup_key) AS (rule, violations)"
        ),
        "n",
    ).select("rule", "n", "violations")
    fk_row = fk.join(F.broadcast(base.select("n"))).select(
        F.lit("custkey_fk_exists").alias("rule"),
        "n",
        F.col("v_fk").alias("violations"),
    )
    rules = rules.unionAll(fk_row)
    return rules.select(
        "rule",
        F.col("n").alias("n_checked"),
        F.col("violations").alias("n_violations"),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
    ).orderBy("rule")
