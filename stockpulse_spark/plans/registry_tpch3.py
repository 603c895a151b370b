"""TPC-H Q7 shape (bilateral trade flows) and a Heaps-law corpus
profile — join-breadth and corpus-growth statistics respectively.

Reference parity: the trade-flow query is the widest join tree in the
repo (fact + 2 independent dim chains through the SAME nation table —
the self-dim pattern); the Heaps profile is the corpus-health summary
a training-data curator reads before sampling decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r4, _r6, _register, _t


@_register(
    "nation_trade_flows",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           COUNT(*) AS n_lineitems,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "analytics"),
    doc="TPC-H Q7 shape: shipping volume between two nations by year, "
    "in both directions. The nation dim joins TWICE under different "
    "roles (supplier's vs customer's nation — aliased independent "
    "broadcasts, the self-dim pattern); the only shuffle joins are "
    "fact->orders. Nation filters reach both dim scans, the date "
    "range reaches the fact scan, and the cross-nation inequality "
    "evaluates post-join in codegen.",
)
def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            _r4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("volume"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_register(
    "corpus_heaps_stats",
    oracle="""
    WITH toks AS (
      SELECT d.source, d.doc_id, unnest(string_split(d.text, ' ')) AS term
      FROM documents d
    )
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT term) AS n_distinct_terms,
           ROUND(COUNT(DISTINCT term) * 1.0 / COUNT(*), 6) AS type_token_ratio,
           ROUND(ln(COUNT(DISTINCT term)) / ln(COUNT(*)), 6) AS heaps_beta
    FROM toks GROUP BY source ORDER BY source
    """,
    tags=("llmdata", "text", "agg"),
    doc="Heaps-law corpus profile per source: token/type counts, "
    "type-token ratio, and the implied Heaps exponent "
    "(ln V / ln N, the slope through the origin of the vocabulary-"
    "growth curve) — the corpus-health summary read before sampling "
    "decisions (a source whose vocabulary stopped growing is "
    "template spam). Two-level distinct aggregation: Spark plans "
    "count(DISTINCT term) per group via Expand + two partial-agg "
    "shuffles, never a per-group collect.",
)
def q_corpus_heaps_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .select("source", "doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = d.select(
        "source", "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    return (
        toks.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("term").alias("n_distinct_terms"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_distinct_terms",
            _r6(F.col("n_distinct_terms") * 1.0 / F.col("n_tokens")).alias(
                "type_token_ratio"
            ),
            _r6(
                F.log(F.col("n_distinct_terms") * 1.0)
                / F.log(F.col("n_tokens") * 1.0)
            ).alias("heaps_beta"),
        )
        .orderBy("source")
    )
