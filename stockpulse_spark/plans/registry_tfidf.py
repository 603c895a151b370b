"""Corpus statistics: TF-IDF top terms and the dedup keeper-assignment
step — the last mile of the text-analysis / dedup stories."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_llmdata import _MUT_CTE, _mutated_corpus


@_register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, rank, term, ROUND(tfidf, 6) AS tfidf
    FROM ranked WHERE rank <= 3
    """,
    tags=("llmdata", "text", "agg"),
    doc="TF-IDF top-3 terms per document: explode → per-doc term "
    "counts + corpus document frequencies (two partial-agg shuffles "
    "over the term key) → smoothed idf ln((N+1)/(df+1)) → per-doc "
    "top-k. The shape of every bag-of-words corpus statistic at "
    "scale; the df table is the only corpus-wide state and it's "
    "vocabulary-sized, broadcastable.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", _r6(F.col("tfidf")).alias("tfidf"))
    )


@_register(
    "dedup_keeper_assignment",
    oracle=_MUT_CTE
    + """
    , pairs AS (
      SELECT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2
      FROM corpus l JOIN corpus r
        ON md5(array_to_string((string_split(l.text, ' '))[1:10], ' '))
         = md5(array_to_string((string_split(r.text, ' '))[1:10], ' '))
       AND l.doc_id < r.doc_id
    ), members AS (
      SELECT doc_id_1 AS doc_id, doc_id_1 AS other FROM pairs
      UNION SELECT doc_id_1, doc_id_2 FROM pairs
      UNION SELECT doc_id_2, doc_id_1 FROM pairs
      UNION SELECT doc_id_2, doc_id_2 FROM pairs
    )
    SELECT doc_id, MIN(other) AS keeper_id,
           CAST(doc_id != MIN(other) AS BOOLEAN) AS is_duplicate
    FROM members GROUP BY doc_id
    """,
    tags=("llmdata", "dedup"),
    doc="keeper assignment — the final dedup step deciding who "
    "survives: near-dup pairs (first-10-words prefix hash buckets the "
    "planted mutations with their originals) → 1-hop min-id label per "
    "member. For multi-hop chains this iterates to a fixpoint "
    "(connected components / label propagation, each iteration one "
    "self-join — genuinely iterative, noted as the non-SQL extension); "
    "1 hop is exact for the pairwise near-dup structure here.",
)
def q_dedup_keeper_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(spark, sf_dir)
    prefix = F.md5(
        F.encode(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 10)), "utf-8")
    )
    keyed = corpus.select("doc_id", prefix.alias("pfx"))
    l = keyed.select(F.col("doc_id").alias("doc_id_1"), "pfx")
    r = keyed.select(F.col("doc_id").alias("doc_id_2"), "pfx")
    pairs = l.join(r, "pfx").filter(F.col("doc_id_1") < F.col("doc_id_2")).select(
        "doc_id_1", "doc_id_2"
    )
    members = (
        pairs.select(F.col("doc_id_1").alias("doc_id"), F.col("doc_id_1").alias("other"))
        .union(pairs.select(F.col("doc_id_1"), F.col("doc_id_2")))
        .union(pairs.select(F.col("doc_id_2"), F.col("doc_id_1")))
        .union(pairs.select(F.col("doc_id_2"), F.col("doc_id_2")))
        .distinct()
    )
    return members.groupBy("doc_id").agg(
        F.min("other").alias("keeper_id"),
        (F.col("doc_id") != F.min("other")).alias("is_duplicate"),
    )
