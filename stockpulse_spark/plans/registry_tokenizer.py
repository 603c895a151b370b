"""Tokenizer-induction statistics: the first BPE merge step (corpus
character-pair frequencies) and word-level PMI collocations — the two
corpus statistics a tokenizer/vocabulary pipeline computes before
anything trains.

Both are one-shuffle aggregations whose result tables are
vocabulary-sized: the corpus scan dominates at 100 TB.  Vocabulary-
sized is NOT metadata-sized — char-pair and collocation tables grow
with the observed charset/vocab — so global ranks over them ride the
range-partitioned prefix-sum machinery and nothing broadcasts them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "bpe_first_merge_stats",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS wd FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(range(1, length(wd)),
                    i -> wd[i:i+1])) AS pair
      FROM words WHERE length(wd) >= 2
    )
    SELECT pair, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair) AS rank
    FROM pairs GROUP BY pair
    ORDER BY rank LIMIT 20
    """,
    tags=("llmdata", "text", "tokenizer"),
    doc="the statistic behind BPE's first merge: corpus frequencies of "
    "adjacent character pairs within words (occurrence-weighted, the "
    "BPE convention), top-20 with full tie-break. In-row pair "
    "expansion (no join), one shuffle on the pair key with map-side "
    "combine — each further merge round in a real trainer is this "
    "same aggregation over a rewritten symbol sequence. The pair "
    "vocabulary is charset-squared — on Unicode web text that is "
    "NOT metadata (150k code points squared clears 1e10), so the "
    "rank rides with_global_rank's range-partitioned prefix sum, "
    "never a single-task window over the pair table.",
)
def q_bpe_first_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.rank import with_global_rank

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("wd")
    ).filter(F.length("wd") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(wd) - 1), "
                "i -> substring(wd, i, 2))"
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        with_global_rank(counted, "-cnt", "pair", rank_col="rank")
        .select("pair", "cnt", "rank")
        .orderBy("rank")
        .limit(20)
    )


@_register(
    "word_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), n_docs AS (
      SELECT COUNT(DISTINCT doc_id) AS n FROM toks
    ), df AS (
      SELECT w, COUNT(*) AS dfreq FROM toks GROUP BY w
    ), pair_df AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS co
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w
      HAVING COUNT(*) >= 5
    )
    SELECT p.w1, p.w2, p.co,
           ROUND(ln((CAST(p.co AS DOUBLE) * n.n)
                    / (CAST(d1.dfreq AS DOUBLE) * d2.dfreq)), 6) AS pmi
    FROM pair_df p
    JOIN df d1 ON p.w1 = d1.w
    JOIN df d2 ON p.w2 = d2.w
    CROSS JOIN n_docs n
    ORDER BY pmi DESC, p.w1, p.w2
    LIMIT 20
    """,
    tags=("llmdata", "text", "agg"),
    doc="document-level PMI collocations: ln(P(w1,w2)/(P(w1)P(w2))) "
    "over distinct doc-term pairs, support >= 5, top-20. The pair "
    "expansion is within-document, in-row over each doc's collected "
    "DISTINCT vocabulary (bounded by per-doc vocabulary squared — "
    "the copurchase shape) so the token table never self-joins. The "
    "document-frequency table is vocabulary-keyed — Heaps'-law "
    "unbounded at 100 TB — so the two df joins carry NO broadcast "
    "hint (AQE broadcasts at test scale, shuffle hash join on the "
    "word key at corpus scale); only the 1-row n_docs scalar is "
    "hinted. The collocation screen a phrase-vocabulary builder "
    "runs.",
)
def q_word_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # one shuffle builds the per-doc distinct vocabulary (map-side
    # partial collect_set); pairs expand in-row over the sorted array
    # (bounded by per-doc vocabulary squared — the copurchase shape),
    # so no token-table self-join ever shuffles
    vocab = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("w")).alias("ws"))
    )
    # docs with NULL text produce no tokens (split -> NULL -> explode
    # drops), so the token-bearing doc count is just the distinct
    # non-null-text doc count — no need to re-derive the vocab for it
    n_docs = docs.filter(F.col("text").isNotNull()).agg(
        F.count_distinct("doc_id").alias("n")
    )
    df = vocab.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("dfreq")
    )
    pair_df = (
        vocab.select(
            F.explode(
                F.expr(
                    "flatten(transform(ws, (x, i) -> "
                    "transform(slice(ws, i + 2, size(ws)), "
                    "y -> struct(x AS w1, y AS w2))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 5)
    )
    d1 = df.select(F.col("w").alias("w1"), F.col("dfreq").alias("df1"))
    d2 = df.select(F.col("w").alias("w2"), F.col("dfreq").alias("df2"))
    return (
        pair_df.join(d1, "w1")
        .join(d2, "w2")
        .join(F.broadcast(n_docs))
        .select(
            "w1",
            "w2",
            "co",
            _r6(
                F.log(
                    (F.col("co").cast("double") * F.col("n"))
                    / (F.col("df1").cast("double") * F.col("df2"))
                )
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )
