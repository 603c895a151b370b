"""Incremental view maintenance for JOINS, self-certified — the
algebra a 100 TB pipeline leans on when yesterday's join result must
absorb today's delta without a full recompute:

    (O ∪ dO) ⋈ (L ∪ dL)
      = O⋈L  ∪  dO⋈L  ∪  O⋈dL  ∪  dO⋈dL

mergeable_weekly_rollup proves the AGGREGATE merge law; this proves
the JOIN law: orders and lineitem are split into base/delta by a
deterministic key predicate, the three delta terms are computed as a
real incremental batch would compute them (delta side always the
SMALL side of the join — broadcast at real scale), and the certificate
row checks term-sum == full-join on integer row counts and integer
revenue cents. Any disagreement — lost rows, double-counted rows, a
join key mangled by the split — flips a boolean the driver hashes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.plans.registry import _register, _t

# deterministic split predicates (any key-stable predicate works; mod
# keeps the delta ~10-14% of each table like a daily increment would)
_O_DELTA = "o_orderkey % 7 = 0"
_L_DELTA = "l_orderkey % 10 = 0"

_CENTS = (
    "CAST(round((CASE WHEN NOT isfinite(l_extendedprice) THEN NULL ELSE l_extendedprice END) * 100) AS BIGINT)"
)


def _term_sql(o_pred: str, l_pred: str, term: str) -> str:
    return f"""
    SELECT '{term}' AS term,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM({_CENTS}), 0) AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE ({o_pred}) AND ({l_pred})
    """


@_register(
    "join_ivm_delta_check",
    oracle=f"""
    WITH terms AS (
      {_term_sql(f"NOT ({_O_DELTA})", f"NOT ({_L_DELTA})", "base_base")}
      UNION ALL
      {_term_sql(_O_DELTA, f"NOT ({_L_DELTA})", "delta_base")}
      UNION ALL
      {_term_sql(f"NOT ({_O_DELTA})", _L_DELTA, "base_delta")}
      UNION ALL
      {_term_sql(_O_DELTA, _L_DELTA, "delta_delta")}
      UNION ALL
      {_term_sql("TRUE", "TRUE", "full_join")}
    ), chk AS (
      SELECT
        SUM(CASE WHEN term = 'full_join' THEN n_rows ELSE -n_rows END)
          AS row_gap,
        SUM(CASE WHEN term = 'full_join' THEN revenue_cents
                 ELSE -revenue_cents END) AS cents_gap
      FROM terms
    )
    SELECT t.term, t.n_rows, t.revenue_cents,
           (c.row_gap = 0 AND c.cents_gap = 0) AS ivm_law_holds
    FROM terms t CROSS JOIN chk c
    ORDER BY t.term
    """,
    tags=("warehouse", "join", "ivm"),
    doc="Join-IVM certificate: orders/lineitem split base/delta by "
    "key predicates, the four join terms of (O u dO) x (L u dL) "
    "computed independently, and a driver-hashed boolean asserting "
    "term-sum == full-join on integer row counts and integer revenue "
    "cents (fold-order free by construction). The incremental-batch "
    "contract mergeable_weekly_rollup proves for aggregates, proved "
    "for joins — at real scale the three delta terms broadcast the "
    "small delta side and the base x base term is yesterday's "
    "materialization, so today's cost is |delta|-proportional.",
)
def q_join_ivm_delta_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.when(
            F.col("l_extendedprice").isNotNull(),
            F.round(nan_nn("l_extendedprice") * 100).cast("bigint"),
        ).alias("cents"),
    )
    o_delta = F.expr(_O_DELTA)
    l_delta = F.expr(_L_DELTA)

    def term(o_pred, l_pred, name: str) -> DataFrame:
        return (
            o.filter(o_pred)
            .join(
                li.filter(l_pred),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0)).alias(
                    "revenue_cents"
                ),
            )
            .select(
                F.lit(name).alias("term"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("revenue_cents").cast("long").alias(
                    "revenue_cents"
                ),
            )
        )

    terms = reduce(
        DataFrame.unionByName,
        [
            term(~o_delta, ~l_delta, "base_base"),
            term(o_delta, ~l_delta, "delta_base"),
            term(~o_delta, l_delta, "base_delta"),
            term(o_delta, l_delta, "delta_delta"),
            term(F.lit(True), F.lit(True), "full_join"),
        ],
    )
    # pin once per invocation: the IVM-law check aggregate and the
    # final report both read the 5-term union — unpinned, all five
    # orders-lineitem joins executed twice. The pinned frame is five
    # rows (optimization r11).
    terms = terms.localCheckpoint(eager=False)
    is_full = F.col("term") == "full_join"
    chk = terms.agg(
        F.sum(
            F.when(is_full, F.col("n_rows")).otherwise(-F.col("n_rows"))
        ).alias("row_gap"),
        F.sum(
            F.when(is_full, F.col("revenue_cents")).otherwise(
                -F.col("revenue_cents")
            )
        ).alias("cents_gap"),
    )
    return (
        terms.crossJoin(F.broadcast(chk))
        .select(
            "term",
            "n_rows",
            "revenue_cents",
            (
                (F.col("row_gap") == 0) & (F.col("cents_gap") == 0)
            ).alias("ivm_law_holds"),
        )
        .orderBy("term")
    )
