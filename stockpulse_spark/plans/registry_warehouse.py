"""Warehouse maintenance / curation shapes: batch MERGE (upsert)
reconciliation, gaps-and-islands (SCD2-style validity intervals),
deterministic train/val/test splitting, and a fixed-bin histogram.

Reference parity: the reference's nightly refresh is write-then-dedup
(bigquery_loader.py write cycle + dedup_pipeline.py:31-53) — MERGE is
that cycle expressed as one declarative reconciliation. The histogram
matches its dashboard's distribution panel family (app/dashboard.py
volume/price distributions); islands and splits are the next asks of a
warehouse user curating training data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import max_by_nn, min_by_nn, nan_nn, not_finite

from stockpulse_spark.llmdata.hashing import hex_to_int_sql, word32_sql
from stockpulse_spark.operators.merge import merge_upsert
from stockpulse_spark.plans.registry import _r4, _register, _t

_CUTOFF = "2000-01-01"


@_register(
    "orders_merge_upsert",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             o_orderdate < TIMESTAMP '{_CUTOFF}' AS is_target,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey, o_orderdate < TIMESTAMP '{_CUTOFF}'
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ), t AS (SELECT * FROM ranked WHERE rn = 1 AND is_target),
       s AS (SELECT * FROM ranked WHERE rn = 1 AND NOT is_target)
    SELECT s.o_custkey, s.o_orderkey, s.o_orderdate,
           ROUND(s.o_totalprice, 4) AS o_totalprice,
           CASE WHEN t.o_custkey IS NULL THEN 'insert' ELSE 'update' END
             AS merge_action
    FROM s LEFT JOIN t ON t.o_custkey = s.o_custkey
    UNION ALL
    SELECT t.o_custkey, t.o_orderkey, t.o_orderdate,
           ROUND(t.o_totalprice, 4) AS o_totalprice, 'keep' AS merge_action
    FROM t WHERE NOT EXISTS (SELECT 1 FROM s WHERE s.o_custkey = t.o_custkey)
    ORDER BY o_custkey
    """,
    tags=("join", "merge"),
    doc="Batch MERGE/upsert (operators/merge.py): the per-customer "
    "latest-order snapshot before the cutoff is the target, the batch "
    "after the cutoff is the source; one full-outer join on the merge "
    "key chooses the newer row and labels every output row insert/"
    "update/keep. The format-independent core of MERGE INTO — the "
    "same reconciliation the reference runs as write-then-dedup "
    "(dedup_pipeline.py:31-53). At scale: one key shuffle per side "
    "(none for the target if it's bucketed by the key), chooser in "
    "codegen. The oracle states the identical semantics as "
    "source-wins UNION ALL unmatched-target.",
)
def q_orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    target = latest(o.filter(F.col("o_orderdate") < cutoff))
    source = latest(o.filter(F.col("o_orderdate") >= cutoff))
    merged = merge_upsert(
        target, source, keys=["o_custkey"], order_by="o_orderdate"
    )
    return merged.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        _r4(F.col("o_totalprice")).alias("o_totalprice"),
        F.col("__merge_action").alias("merge_action"),
    ).orderBy("o_custkey")


@_register(
    "value_band_islands",
    oracle="""
    -- CAST: DuckDB date_trunc('day') yields DATE, Spark a timestamp
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(floor(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) / 50.0) AS INTEGER) AS band
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), grp AS (
      SELECT user_id, day, band,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           - ROW_NUMBER() OVER (PARTITION BY user_id, band ORDER BY day)
               AS island
      FROM daily
    )
    SELECT user_id, band,
           MIN(day) AS valid_from, MAX(day) AS valid_to,
           COUNT(*) AS n_days
    FROM grp GROUP BY user_id, band, island
    ORDER BY user_id, valid_from
    """,
    tags=("window", "scd"),
    doc="Gaps-and-islands: contiguous runs of each user's daily-close "
    "price band collapsed to (valid_from, valid_to) intervals — the "
    "SCD2 history-build shape, via the row_number-difference trick "
    "(two window ranks over the SAME partitioning share one exchange; "
    "the island id is their difference, constant within a run). Band "
    "edges compare identical doubles in both engines because the "
    "daily close is the same arg_max-selected parquet value.",
)
def q_value_band_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.floor(max_by_nn(nan_nn("value"), "ts") / 50.0).cast("int").alias("band")
    )
    wa = Window.partitionBy("user_id").orderBy("day")
    wb = Window.partitionBy("user_id", "band").orderBy("day")
    grp = daily.withColumn(
        "island", F.row_number().over(wa) - F.row_number().over(wb)
    )
    return (
        grp.groupBy("user_id", "band", "island")
        .agg(
            F.min("day").alias("valid_from"),
            F.max("day").alias("valid_to"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("user_id", "band", "valid_from", "valid_to", "n_days")
        .orderBy("user_id", "valid_from")
    )


@_register(
    "doc_train_test_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, n_chars,
             {hex_to_int_sql("md5(text)")} % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY 1 ORDER BY split
    """,
    tags=("llmdata", "sample"),
    doc="Deterministic 80/10/10 train/val/test split keyed on the "
    "md5 of the CONTENT (not the id): identical text always lands in "
    "the same split, so exact duplicates can never leak from train "
    "into test — the property an id-keyed split loses after any "
    "re-ingestion. Pure Column expressions, one partial-agg shuffle "
    "of three groups; the md5-derived bucket is the repo-wide "
    "cross-engine hashing recipe (llmdata/hashing.py).",
)
def q_doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    b = d.select(
        "n_chars",
        (
            F.expr(hex_to_int_sql("md5(text)")) % 100
        ).alias("bucket"),
    )
    split = (
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
    )
    return (
        b.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


@_register(
    "value_histogram",
    oracle="""
    SELECT CAST(least(floor(value / 25.0), 19) AS INTEGER) AS bucket,
           -- CAST: int * 25.0 is DECIMAL in DuckDB, double in Spark
           CAST(least(floor(value / 25.0), 19) AS INTEGER) * CAST(25.0 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    WHERE value IS NOT NULL AND isfinite(value)
    GROUP BY 1, 2 ORDER BY bucket
    """,
    tags=("agg", "histogram"),
    doc="Fixed-bin histogram of event values (20 bins of width 25, "
    "top bin open): floor arithmetic instead of width_bucket so both "
    "engines compute the identical bin — the dashboard-distribution "
    "shape (reference app/dashboard.py distribution panels), one "
    "partial-agg shuffle of at most 20 groups.",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~not_finite("value")
    )
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("int")
    return (
        ev.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r4(F.sum("value")).alias("total_value"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 25.0).alias("bucket_lo"),
            "n",
            "total_value",
        )
        .orderBy("bucket")
    )


@_register(
    "scd2_point_in_time_join",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(floor(last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) / 50.0) AS INTEGER) AS band
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), grp AS (
      SELECT user_id, day, band,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           - ROW_NUMBER() OVER (PARTITION BY user_id, band ORDER BY day)
               AS island
      FROM daily
    ), dim AS (
      SELECT user_id, band,
             MIN(day) AS valid_from, MAX(day) AS valid_to
      FROM grp GROUP BY user_id, band, island
    )
    SELECT d.band,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e
    JOIN dim d ON d.user_id = e.user_id
     AND CAST(date_trunc('day', e.ts) AS TIMESTAMP)
         BETWEEN d.valid_from AND d.valid_to
    GROUP BY d.band ORDER BY d.band
    """,
    tags=("join", "scd"),
    doc="Point-in-time (PIT) join against the SCD2 dimension built by "
    "value_band_islands: every event matched to the band interval "
    "effective on its day — the as-of-history lookup that makes "
    "training features leak-free (joining today's attributes onto "
    "yesterday's facts is the classic leakage bug). The interval "
    "predicate rides the user_id equi-join; per-user interval counts "
    "are bounded (bands change slowly), so fanout is checked, never "
    "quadratic. Every event lands in EXACTLY one interval by "
    "construction — asserted as an invariant test.",
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.floor(max_by_nn(nan_nn("value"), "ts") / 50.0).cast("int").alias("band")
    )
    wa = Window.partitionBy("user_id").orderBy("day")
    wb = Window.partitionBy("user_id", "band").orderBy("day")
    grp = daily.withColumn(
        "island", F.row_number().over(wa) - F.row_number().over(wb)
    )
    dim = grp.groupBy("user_id", "band", "island").agg(
        F.min("day").alias("valid_from"), F.max("day").alias("valid_to")
    )
    e = ev.select(
        "user_id", "value", F.date_trunc("day", "ts").alias("e_day")
    )
    joined = e.join(
        dim.select("user_id", "band", "valid_from", "valid_to"),
        on=["user_id"],
    ).filter(
        F.col("e_day").between(F.col("valid_from"), F.col("valid_to"))
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _r4(F.sum("value")).alias("total_value"),
        )
        .orderBy("band")
    )


_N_SHARDS = 16
_SHARD_SQL = word32_sql("CAST(doc_id AS STRING)") + f" % {_N_SHARDS}"


@_register(
    "shard_assignment_balance",
    oracle=f"""
    WITH s AS (
      SELECT {_SHARD_SQL} AS shard, length(text) AS n_chars
      FROM documents
    ), per AS (
      SELECT shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM s GROUP BY shard
    )
    SELECT CAST(shard AS INT) AS shard, n_docs, total_chars,
           MAX(n_docs) OVER () * 1.0 <= 2.0 * AVG(n_docs) OVER ()
             AS balanced_2x
    FROM per ORDER BY shard
    """,
    tags=("llmdata", "warehouse", "sampling"),
    doc="Write-side output sharding for a training corpus: md5-derived "
    f"32-bit key hash mod {_N_SHARDS} (cross-engine deterministic — "
    "llmdata/hashing.py, NOT Spark's hash()), per-shard doc/byte "
    "rollup, and a hashed balance certificate (max shard <= 2x mean). "
    "This is the repartition(expr) a 100 TB corpus writer uses so "
    "every output file lands near the same size regardless of source "
    "skew; the certificate is the check that the key really spreads — "
    "a sequential or low-entropy id would fail it. One partial-agg "
    f"shuffle on the shard key; the {_N_SHARDS}-row balance window is "
    "post-aggregation (driver-scale).",
)
def q_shard_assignment_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    per = (
        d.select(
            F.expr(_SHARD_SQL).alias("shard"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        F.col("shard").cast("int").alias("shard"),
        "n_docs",
        "total_chars",
        (
            F.max("n_docs").over(w) * 1.0 <= 2.0 * F.avg("n_docs").over(w)
        ).alias("balanced_2x"),
    ).orderBy("shard")
