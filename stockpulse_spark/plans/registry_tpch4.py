"""TPC-H Q8 shape: national market share inside a region.

Reference parity: the widest star join in the repo — fact ->
part/supplier/orders/customer plus BOTH nation roles and region —
collapsed into a conditional-aggregate share. The reference's
dashboard answers "what fraction of revenue came from X" with pandas
filters (app/dashboard.py aggregate views); at warehouse scale the
same question is this one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "nation_market_share",
    oracle="""
    WITH base AS (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
                     AND r.r_name = 'EUROPE'
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT CAST(o_year AS INTEGER) AS o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3'
                          THEN volume ELSE 0 END), 4) AS nation_volume,
           ROUND(SUM(volume), 4) AS total_volume,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3'
                          THEN volume ELSE 0 END) / SUM(volume), 6)
             AS mkt_share
    FROM base GROUP BY o_year ORDER BY o_year
    """,
    tags=("join", "analytics"),
    doc="TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold "
    "to EUROPE customers, by order year. Share = conditional sum / "
    "total sum in ONE aggregation pass — never two scans. Part filter "
    "and date range push into their scans; part/supplier/nation/"
    "region/customer broadcast (nation under two roles via aliased "
    "independent broadcasts); the only shuffle join is fact->orders. "
    "At 100 TB supplier/customer outgrow the broadcast threshold and "
    "AQE demotes them to shuffle joins on their sorted keys — the "
    "plan shape is unchanged.",
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_rkey"),
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_3", volume
    ).otherwise(F.lit(0.0))
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == r.r_regionkey)
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            _r4(F.sum(nation_vol)).alias("nation_volume"),
            _r4(F.sum(volume)).alias("total_volume"),
            _r6(F.sum(nation_vol) / F.sum(volume)).alias("mkt_share"),
        )
        .orderBy("o_year")
    )
