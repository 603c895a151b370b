"""Subquery-shaped relational queries (TPC-H Q18/Q19/Q22 patterns):
IN-subquery with HAVING, disjunctive predicate pushdown, NOT-EXISTS
with a scalar-subquery filter, and per-group top-1 via window rank.
These are the decorrelation shapes Catalyst rewrites into joins — the
engine surface a reference user would hit first when growing past the
fixed dashboard SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 4) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 4) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    tags=("join", "subquery"),
    doc="TPC-H Q18 shape: IN-subquery with grouped HAVING — Catalyst "
    "decorrelates to a semi-join against the pre-aggregated keys; the "
    "aggregation is map-side partial so the semi-join probe is tiny.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(big, on="l_orderkey", how="left_semi")
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_r4(F.sum("l_quantity")).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            _r4(F.col("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@_register(
    "disjunctive_filter",
    oracle="""
    SELECT ROUND(SUM(CASE WHEN isfinite(l.l_extendedprice)
                           AND isfinite(l.l_discount)
                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                     END) / 10000.0, 4) AS revenue,
           COUNT(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20)
       OR (p.p_size >= 40 AND l.l_quantity < 5)
    """,
    tags=("join", "filter"),
    doc="TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst "
    "extracts the common single-side conjuncts and pushes them below "
    "the join; the residual disjunction evaluates post-join in "
    "codegen. Revenue sums exact integer ten-thousandths "
    "(summation-order-independent; the sf1 sweep caught the float "
    "sum on a .5-render boundary, same class as revenue_by_nation); "
    "non-finite money masks like NULL.",
)
def q_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.functions.nullsafe import not_finite

    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_size") >= 40) & (F.col("l_quantity") < 5))
    )
    rev_1e4 = F.when(
        ~not_finite("l_extendedprice") & ~not_finite("l_discount"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint")),
    )
    return j.filter(cond).agg(
        _r4(F.sum(rev_1e4) / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "idle_rich_customers",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 4) AS total_acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("join", "subquery", "anti"),
    doc="TPC-H Q22 shape: above-average customers with no very large "
    "(>450k) order — scalar subquery filter + NOT EXISTS decorrelated "
    "to a left-anti join. The scalar avg broadcasts; the "
    "anti-join probes the orders keys.",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o.filter(F.col("o_totalprice") > 450000), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r4(F.sum("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@_register(
    "top_order_per_customer",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT c.c_name, r.o_orderkey,
           ROUND(r.o_totalprice, 4) AS o_totalprice, r.o_orderdate
    FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
    WHERE r.rn = 1
    ORDER BY c.c_name
    """,
    tags=("window", "join"),
    doc="per-group top-1 (greatest-n-per-group): window rank + filter, "
    "then a broadcast dim join — the decorrelated form of a "
    "correlated 'largest order per customer' subquery.",
)
def q_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    top = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        top.join(F.broadcast(c), top.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            _r4(F.col("o_totalprice")).alias("o_totalprice"),
            "o_orderdate",
        )
        .orderBy("c_name")
    )


@_register(
    "small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
           COUNT(*) AS n_lineitems
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.qty_cut
    """,
    tags=("join", "subquery"),
    doc="TPC-H Q17 shape: correlated scalar-average subquery "
    "(quantity below 20% of the part's average) decorrelated into a "
    "pre-aggregated per-part cutoff joined back to the fact — one "
    "partial-agg shuffle + one equi-join instead of a per-row "
    "correlated probe. The per-part cutoff table is part-count-sized "
    "and broadcastable at any scale.",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    pa = l.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    j = l.join(F.broadcast(pa), "l_partkey").filter(
        F.col("l_quantity") < F.col("qty_cut")
    )
    return j.agg(
        _r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )
