"""TPC-H Q2/Q11/Q15 shapes adapted to this schema (no partsupp table —
lineitem's (l_partkey, l_suppkey, price) triples stand in as the
part-supplier cost relation). These complete the classic decorrelation
family begun in registry_subqueries (Q18/Q19/Q22/Q17): correlated MIN,
global-scalar HAVING, and max-of-aggregated-view.

Reference parity: the reference exposes ad-hoc SQL over its warehouse
(app/dashboard.py query surface); these are the next relational shapes a
user of that surface writes once they outgrow the fixed dashboard
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


def _supplier_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (part, supplier) mean unit price from lineitem — the
    partsupp stand-in. One partial-agg shuffle on the composite key;
    the result is |part|x|supplier|-bounded (catalog-sized, far below
    the fact table) so everything downstream can broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    # priced, quantified lines only: a NULL/zero-qty line carries no
    # unit cost, and an all-NULL (part,supp) group would put a NULL
    # unit_cost into the rank ORDER BY where Spark (NULLS FIRST) and
    # DuckDB (NULLS LAST) disagree
    return (
        l.filter(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_quantity").isNotNull()
            & (F.col("l_quantity") != 0)
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.avg(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("unit_cost")
        )
    )


@_register(
    "min_cost_supplier",
    oracle="""
    WITH ps AS (
      -- priced, quantified lines only (see _supplier_cost: an
      -- all-NULL group's NULL unit_cost would shear the rank
      -- ORDER BY between engines)
      SELECT l_partkey, l_suppkey,
             AVG(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND l_quantity <> 0
      GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ps.unit_cost,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY ROUND(ps.unit_cost, 6), ps.l_suppkey) AS rn
      FROM ps
      JOIN part p     ON p.p_partkey = ps.l_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size <= 10
    )
    SELECT p_partkey, p_name, s_name, n_name,
           ROUND(unit_cost, 4) AS unit_cost
    FROM ranked WHERE rn = 1
    ORDER BY p_partkey
    """,
    tags=("join", "subquery", "window"),
    doc="TPC-H Q2 shape: cheapest EUROPE supplier per small part. The "
    "correlated 'cost = (SELECT MIN ...)' subquery is decorrelated to "
    "a window top-1 over the part-supplier cost relation; dims "
    "(part/supplier/nation/region) all broadcast, so the only shuffle "
    "is the cost pre-aggregation on (part, supplier) — which at any "
    "scale is catalog-sized, not fact-sized. Tie-break on rounded "
    "cost then suppkey keeps the winner deterministic across engines.",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _supplier_cost(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    j = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        _r6(F.col("unit_cost")), F.col("l_suppkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            _r4(F.col("unit_cost")).alias("unit_cost"),
        )
        .orderBy("p_partkey")
    )


@_register(
    "important_parts",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey, SUM(l.l_extendedprice) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, ROUND(part_value, 4) AS part_value
    FROM (
      SELECT l_partkey, part_value, AVG(part_value) OVER () * 2.0 AS cut
      FROM pv
    )
    WHERE part_value > cut
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("join", "subquery"),
    doc="TPC-H Q11 shape: parts whose value (via one nation's "
    "suppliers) exceeds a global-scalar threshold — 2x the mean part "
    "value rather than Q11's fixed fraction of the total, so the "
    "selectivity is scale-invariant (a fixed fraction selects nothing "
    "once the part catalog grows 10x). The per-part aggregate is "
    "pinned with ONE localCheckpoint so the fact table is scanned and "
    "shuffled exactly once (a scalar subquery would rescan it — "
    "verified: that form scans lineitem twice); the threshold is then "
    "a distributed partial-AVG over the pinned frame broadcast back "
    "as one row, so the catalog-sized aggregate never funnels "
    "through a single-partition window task.",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("part_value"))
        .localCheckpoint(eager=False)
    )
    cut = pv.agg((F.avg("part_value") * 2.0).alias("__cut"))
    return (
        pv.crossJoin(F.broadcast(cut))
        .filter(F.col("part_value") > F.col("__cut"))
        .select("l_partkey", _r4(F.col("part_value")).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@_register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 4) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("join", "subquery"),
    doc="TPC-H Q15 shape: supplier(s) with maximum quarterly revenue. "
    "The revenue 'view' is computed once (date filter pushed to the "
    "scan, partial-agg shuffle on suppkey), its 1-row MAX broadcasts "
    "back against itself, and the supplier dim broadcasts for the "
    "final name lookup. Winner-by-equality is safe across engines: "
    "each engine compares its own sum against its own max, so only a "
    "sub-1e-9 revenue tie between two suppliers could diverge.",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__max"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _r4(F.col("total_revenue")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )
