"""TPC-H completion set: the join/agg shapes from the classic suite not
yet covered by registry_tpch2-4 — Q3 (shipping priority), Q9 (profit by
nation x year, supplycost adapted to the schema), Q10 (returned-item
reporting), Q12 (late-shipment priority split), Q14 (promo revenue
share), Q16 (supplier-count by part attributes).

These are the canonical 100 TB shapes: multi-way fact-dim joins where
the dims (nation, supplier, part) broadcast or AQE-resolve, the fact
tables shuffle once on the group key, and every filter reaches the
parquet scan. The reference's dashboard never runs these, but its
warehouse (BigQuery) serves exactly this query class; parity here is
what makes the engine a drop-in warehouse, not just a dashboard
backend (reference app/dashboard.py:33-46 hand-writes its SQL against
the same star schema)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "tpch"),
    doc="TPC-H Q3 shape: 3-way fact join with per-side pushed filters, "
    "group on the order key, global top-10 by revenue (TakeOrderedAndProject "
    "— no full sort). Deterministic tie-break on (o_orderdate, l_orderkey).",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@_register(
    "returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           ROUND(c.c_acctbal, 4) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1999-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("join", "tpch"),
    doc="TPC-H Q10 shape: returned-revenue per customer over a half-year "
    "window — lineitem filters on returnflag at the scan, nation "
    "broadcasts, one shuffle on the customer group key, top-20.",
)
def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            _r4(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@_register(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           -- exact integer ten-thousandths (cents x (100-disc%) minus
           -- 60 x retail-cents x qty): summation-order-independent;
           -- the sf1 sweep caught the float sum on a .5-render
           -- boundary. Non-finite money masks like NULL.
           ROUND(SUM(CASE WHEN isfinite(l.l_extendedprice)
                           AND isfinite(l.l_discount)
                           AND isfinite(p.p_retailprice)
                           AND isfinite(l.l_quantity)
                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                          - 60 * CAST(round(p.p_retailprice * 100) AS BIGINT)
                               * CAST(round(l.l_quantity) AS BIGINT)
                     END) / 10000.0, 4) AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY nation, o_year
    """,
    tags=("join", "tpch"),
    doc="TPC-H Q9 shape (supplycost adapted: 0.6 x p_retailprice stands "
    "in for ps_supplycost — the schema has no partsupp table): 5-way "
    "star join, profit rollup by supplier nation x order year. part/"
    "supplier/nation resolve to broadcasts under AQE at this SF; at "
    "100 TB part becomes a shuffle join on l_partkey while nation "
    "stays broadcast — the plan degrades gracefully per-dim.",
)
def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    from stockpulse_spark.functions.nullsafe import not_finite

    finite = (
        ~not_finite("l_extendedprice")
        & ~not_finite("l_discount")
        & ~not_finite("p_retailprice")
        & ~not_finite("l_quantity")
    )
    profit_1e4 = F.when(
        finite,
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        - 60
        * F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.round(F.col("l_quantity")).cast("bigint"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(_r4(F.sum(profit_1e4) / 10000.0).alias("profit"))
        .orderBy("nation", "o_year")
    )


@_register(
    "late_shipment_priority",
    oracle="""
    SELECT
      CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           THEN 'late' ELSE 'ontime' END AS ship_status,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "tpch"),
    doc="TPC-H Q12 shape (shipmode adapted: the schema has no "
    "l_shipmode, so the split key is ship latency vs a 60-day SLA): "
    "conditional-sum pivot over a fact-fact join; both CASE branches "
    "evaluate in one pass, map-side partial agg makes the shuffle two "
    "rows per partition regardless of input size.",
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                F.lit("late"),
            )
            .otherwise(F.lit("ontime"))
            .alias("ship_status"),
            F.when(high, 1).otherwise(0).alias("__hi"),
            F.when(~high, 1).otherwise(0).alias("__lo"),
        )
        .groupBy("ship_status")
        .agg(
            F.sum("__hi").alias("high_line_count"),
            F.sum("__lo").alias("low_line_count"),
        )
        .orderBy("ship_status")
    )


@_register(
    "promo_revenue_monthly",
    oracle="""
    WITH l2 AS (
      -- exact integer ten-thousandths; non-finite money masks NULL
      SELECT l_partkey, l_shipdate,
             CASE WHEN isfinite(l_extendedprice) AND isfinite(l_discount)
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                  END AS rev4
      FROM lineitem WHERE l_shipdate IS NOT NULL
    )
    SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
           ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                       THEN l.rev4 ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(l.rev4) AS DOUBLE), 6) AS promo_pct,
           ROUND(SUM(l.rev4) / 10000.0, 4) AS total_revenue
    FROM l2 l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "tpch"),
    doc="TPC-H Q14 shape, widened from one month to a monthly series: "
    "promo revenue share via conditional aggregation over a "
    "fact-dim join. The part dim carries only (p_partkey, p_type) "
    "through the join — column pruning keeps the build side minimal. "
    "Money sums in exact integer ten-thousandths (summation-order-"
    "independent; the sf1 sweep caught the float total on a "
    ".5-render boundary) and the promo share is one division of two "
    "exact integers; non-finite money masks like NULL.",
)
def q_promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.functions.nullsafe import not_finite

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev4 = F.when(
        ~not_finite("l_extendedprice") & ~not_finite("l_discount"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint")),
    )
    return (
        # a NULL ship date has no month on the axis (and its Spark
        # None vs DuckDB NaT cell would shear the driver's string canon)
        li.filter(F.col("l_shipdate").isNotNull())
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.trunc("l_shipdate", "month").alias("month"))
        .agg(
            _r6(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev4).otherwise(
                        F.lit(0).cast("bigint")
                    )
                ).cast("double")
                / F.sum(rev4).cast("double")
            ).alias("promo_pct"),
            _r4(F.sum(rev4) / 10000.0).alias("total_revenue"),
        )
        .orderBy("month")
    )


@_register(
    "supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 10, 20, 30, 40, 49)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("join", "tpch", "subquery"),
    doc="TPC-H Q16 shape (partsupp adapted to observed lineitem pairs; "
    "negative s_acctbal stands in for the complaints filter): NOT IN "
    "decorrelated to a broadcast left-anti join, then COUNT(DISTINCT) "
    "per part attribute — Spark expands the distinct into a two-level "
    "agg, so the first shuffle dedups (group, suppkey) pairs with "
    "map-side combine before counting.",
)
def q_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 10, 20, 30, 40, 49)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p.select("p_partkey", "p_brand", "p_type", "p_size"),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@_register(
    "excess_quantity_suppliers",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey, SUM(l_quantity) AS part_qty FROM lineitem
      GROUP BY l_partkey
    ), per_pair AS (
      SELECT l_suppkey, l_partkey, SUM(l_quantity) AS pair_qty
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ), dominant AS (
      SELECT pp.l_suppkey, pp.l_partkey
      FROM per_pair pp JOIN per_part p ON pp.l_partkey = p.l_partkey
      WHERE pp.pair_qty > 0.15 * p.part_qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name,
           COUNT(*) AS n_dominated_parts
    FROM dominant d
    JOIN supplier s ON d.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    ORDER BY n_dominated_parts DESC, s.s_suppkey
    LIMIT 25
    """,
    tags=("join", "tpch", "subquery"),
    doc="TPC-H Q20 shape (partsupp availqty adapted to observed "
    "shipments): suppliers who ship an outsized share (>15%, vs a "
    "~3.7% median pair share in this data) of a part's total "
    "quantity, counted per supplier. Two aggregations share the "
    "l_partkey shuffle (the per-part total joins back onto the "
    "per-pair rollup), then supplier/nation broadcast onto the "
    "supplier-sized result.",
)
def q_excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("part_qty")
    )
    per_pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("pair_qty")
    )
    dominant = per_pair.join(per_part, "l_partkey").filter(
        F.col("pair_qty") > 0.15 * F.col("part_qty")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        dominant.join(
            F.broadcast(s.select("s_suppkey", "s_name", "s_nationkey")),
            dominant.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy(F.desc("n_dominated_parts"), "s_suppkey")
        .limit(25)
    )


@_register(
    "forecast_revenue_change",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      AND l_shipdate < TIMESTAMP '2000-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
    doc="TPC-H Q6 shape: pure scan-side conjunctive filter + single "
    "aggregate — every predicate (date range, discount band, quantity "
    "cap) reaches the parquet scan as a pushed filter, the agg is one "
    "map-side-combined row. The canonical 'is pushdown working' probe.",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
    tags=("tpch", "join", "agg"),
    doc="TPC-H Q13 shape: the order-count histogram over ALL customers "
    "including zero-order ones — the LEFT OUTER join is the point "
    "(an inner join would silently drop the empty bucket). Two "
    "aggregations; the second runs on the order-count-sized "
    "distribution.",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@_register(
    "waiting_suppliers",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CAST(l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS BOOLEAN)
               AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name,
           COUNT(*) AS numwait
    FROM flagged l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (
        SELECT 1 FROM flagged l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM flagged l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("join", "tpch", "subquery"),
    doc="TPC-H Q21 shape (suppliers who kept orders waiting), adapted "
    "to the schema: 'late' = shipped more than 90 days after the "
    "order date (the testdata carries no commit/receipt dates; the "
    "decorrelation structure is the point). EXISTS -> LEFT SEMI join "
    "on (orderkey, other-supplier), NOT EXISTS -> LEFT ANTI join on "
    "the late subset — the classic double-decorrelation over one "
    "shared lateness-flagged scan, shuffled once on l_orderkey; the "
    "supplier dim broadcasts. Top-20 via TakeOrderedAndProject with "
    "a deterministic s_name tie-break.",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # pin the flagged join once per invocation (the r11 multi-branch
    # pin policy): it feeds the semi side, the anti side, and the
    # survivor spine — unpinned, the lineitem⋈orders join executed 3x
    flagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.make_interval(days=F.lit(90))
            ).alias("is_late"),
        )
        .localCheckpoint(eager=False)
    )
    l1 = flagged.filter(F.col("is_late")).alias("l1")
    l2 = flagged.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = flagged.filter(F.col("is_late")).select(
        "l_orderkey", "l_suppkey"
    ).alias("l3")
    with_other = l1.join(
        l2,
        on=[
            F.col("l1.l_orderkey") == F.col("l2.l_orderkey"),
            F.col("l1.l_suppkey") != F.col("l2.l_suppkey"),
        ],
        how="left_semi",
    )
    exclusive = with_other.join(
        l3,
        on=[
            F.col("l1.l_orderkey") == F.col("l3.l_orderkey"),
            F.col("l1.l_suppkey") != F.col("l3.l_suppkey"),
        ],
        how="left_anti",
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        exclusive.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
