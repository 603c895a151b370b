"""Consistency: the single-column feature builders (quality_score,
lang_guess, fingerprint) and the optimized batch add_text_stats must
compute identical values — pins the two implementations together so
they can't silently diverge. Same for the two SRP bucket paths
(literal-expression vs broadcast-data-join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockpulse_spark.llmdata.similarity import (
    _as_double,
    pseudo_planes,
    srp_bucket,
)
from stockpulse_spark.llmdata.textstats import (
    add_text_stats,
    fingerprint,
    lang_guess,
    quality_score,
)
from stockpulse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_single_column_builders_match_batch(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    batch = add_text_stats(docs).select(
        "doc_id", "quality_score", "lang_guess", "fp_md5", "fp_min_shingle"
    )
    fp = fingerprint(F.col("text"))
    single = docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality_score"),
        lang_guess(F.col("text")).alias("lang_guess"),
        fp["md5"].alias("fp_md5"),
        fp["min_shingle_hash"].alias("fp_min_shingle"),
    )
    b = {r["doc_id"]: tuple(r)[1:] for r in batch.collect()}
    s = {r["doc_id"]: tuple(r)[1:] for r in single.collect()}
    assert b == s


def test_srp_bucket_paths_agree(spark):
    """Literal-expression buckets (srp_bucket, used to generate the
    DuckDB oracle) must equal the broadcast-data-join buckets inside
    srp_lsh_topk. Recompute the data-join side here the same way."""
    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    planes = pseudo_planes(4, 64, table=2)
    lit_side = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            srp_bucket(_as_double(F.col("embedding")), planes).alias("b"),
        ).collect()
    }
    rows = [(2, j, planes[j]) for j in range(4)]
    pdf = spark.createDataFrame(rows, "tidx int, pidx int, plane array<double>")
    from stockpulse_spark.llmdata.similarity import dot

    joined = (
        emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        .crossJoin(F.broadcast(pdf))
        .select(
            "vec_id",
            F.when(
                dot(F.col("v"), F.col("plane")) > 0, F.expr("shiftleft(1, pidx)")
            )
            .otherwise(F.lit(0))
            .alias("bit"),
        )
        .groupBy("vec_id")
        .agg(F.sum("bit").cast("int").alias("b"))
    )
    data_side = {r["vec_id"]: r["b"] for r in joined.collect()}
    assert lit_side == data_side
