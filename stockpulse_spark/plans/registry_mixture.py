"""Mixture planning and curriculum ordering — the two scheduling
decisions a training-data pipeline makes AFTER curation: how many
epochs of each source to take, and in what order to feed documents.

- source_epoch_plan: the data-constrained scaling recipe (Muennighoff
  et al. 2023 — repeating data is worth it up to ~4 epochs, then
  value decays): temperature-weighted allocation of a fixed token
  budget across sources, with the per-source epoch count capped at 4
  and the stranded (unspendable) budget made visible. Companion to
  source_sampling_weights (alpha=0.3 weights only); this turns
  weights into an executable repeat plan.
- curriculum_order: a deterministic global feed order — length
  buckets ascending (short-first curriculum), md5-derived shuffle
  within a bucket, doc_id tiebreak — materialized as a 1-based global
  rank via operators/rank.py::with_global_rank (range-partitioned
  prefix-sum, NEVER a single-task global window). Gives the
  distributed rank operator a second oracle-gated consumer beyond
  score_auc_rank/woe_binning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.hashing import word32_sql
from stockpulse_spark.operators.rank import with_global_rank
from stockpulse_spark.plans.registry import _r6, _register, _t

_ALPHA = 0.5
_MAX_EPOCHS = 4.0
_BUDGET_EPOCHS = 2.0  # total budget = 2x the corpus token count


@_register(
    "source_epoch_plan",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             COUNT(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents WHERE text IS NOT NULL GROUP BY source
    ), raw AS (
      SELECT source, n_docs, n_tokens,
             pow(n_tokens * 1.0 / SUM(n_tokens) OVER (), {_ALPHA})
               AS pw,
             {_BUDGET_EPOCHS} * SUM(n_tokens) OVER () AS budget
      FROM per_src
    ), shares AS (
      SELECT source, n_docs, n_tokens, budget,
             pw / SUM(pw) OVER () AS w
      FROM raw
    ), plan AS (
      SELECT source, n_docs, n_tokens, w,
             budget * w AS alloc_tokens,
             LEAST({_MAX_EPOCHS}, budget * w / n_tokens) AS epochs
      FROM shares
    )
    SELECT source,
           n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(w, 6) AS weight,
           ROUND(alloc_tokens, 6) AS alloc_tokens,
           ROUND(epochs, 6) AS epochs,
           ROUND(epochs * n_tokens, 6) AS effective_tokens,
           ROUND(epochs * n_tokens / alloc_tokens, 6)
             AS budget_utilization
    FROM plan ORDER BY source
    """,
    tags=("llmdata", "sample", "agg"),
    doc=f"data-constrained epoch plan: a {_BUDGET_EPOCHS}x-corpus token "
    f"budget split by temperature weights (alpha={_ALPHA}), per-source "
    f"epochs capped at {_MAX_EPOCHS} (the repeat-value decay point); "
    "budget_utilization < 1 exposes budget stranded on capped "
    "sources, the signal to re-temper or admit more data. Same scale "
    "shape as source_sampling_weights: one partial-agg shuffle to "
    "source-level metadata, then unpartitioned windows over tens of "
    "rows.",
)
def q_source_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", "text")
    )
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    w0 = Window.partitionBy()
    # corpus-total window sum named once (feeds share AND budget)
    tot = per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(w0).alias("__tot"),
    )
    share = F.col("n_tokens") * 1.0 / F.col("__tot")
    raw = tot.select(
        "source",
        "n_docs",
        "n_tokens",
        F.pow(share, _ALPHA).alias("pw"),
        (F.lit(_BUDGET_EPOCHS) * F.col("__tot")).alias("budget"),
    )
    shares = raw.select(
        "source",
        "n_docs",
        "n_tokens",
        "budget",
        (F.col("pw") / F.sum("pw").over(w0)).alias("w"),
    )
    plan = shares.select(
        "source",
        "n_docs",
        "n_tokens",
        "w",
        (F.col("budget") * F.col("w")).alias("alloc_tokens"),
        F.least(
            F.lit(_MAX_EPOCHS),
            F.col("budget") * F.col("w") / F.col("n_tokens"),
        ).alias("epochs"),
    )
    return plan.select(
        "source",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _r6(F.col("w")).alias("weight"),
        _r6(F.col("alloc_tokens")).alias("alloc_tokens"),
        _r6(F.col("epochs")).alias("epochs"),
        _r6(F.col("epochs") * F.col("n_tokens")).alias(
            "effective_tokens"
        ),
        _r6(
            F.col("epochs") * F.col("n_tokens") / F.col("alloc_tokens")
        ).alias("budget_utilization"),
    ).orderBy("source")


_CURR_HASH = word32_sql("concat('curr|', CAST(doc_id AS VARCHAR(20)))")


@_register(
    "curriculum_order",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             LEAST(3, len(string_split(text, ' ')) // 25) AS bucket,
             len(string_split(text, ' ')) AS n_words,
             {_CURR_HASH} AS h
      FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY bucket, h, doc_id)
                AS BIGINT) AS feed_rank,
           doc_id,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(n_words AS BIGINT) AS n_words
    FROM scored ORDER BY feed_rank
    """,
    tags=("llmdata", "window", "rank"),
    doc="deterministic training feed order: length buckets ascending "
    "(short-first curriculum), md5-derived shuffle within a bucket, "
    "doc_id tiebreak — duplicate doc_ids get interchangeable "
    "adjacent ranks, so the output is stable as a multiset. The "
    "global rank runs through with_global_rank (range repartition + "
    "per-partition row_number + broadcast prefix-sum), never a "
    "single-task Window.orderBy — the plan that still works when "
    "the corpus is 10^10 documents.",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.least(
                F.lit(3), F.expr("size(split(text, ' ')) div 25")
            ).alias("bucket"),
            F.size(F.split("text", " ")).alias("n_words"),
            F.expr(_CURR_HASH).alias("h"),
        )
    )
    ranked = with_global_rank(
        scored, "bucket", "h", "doc_id", rank_col="feed_rank"
    )
    return ranked.select(
        F.col("feed_rank").cast("long").alias("feed_rank"),
        "doc_id",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_words").cast("long").alias("n_words"),
    ).orderBy("feed_rank")
