"""Content-defined chunking (CDC) dedup — the storage-dedup technique
(Rabin/gear rolling-hash boundaries) applied at word granularity to a
text corpus: a chunk boundary falls wherever the word's hash satisfies
a mask, so boundaries are a function of CONTENT, not position.
Inserting one word near the start of a near-copy re-chunks only the
chunk it lands in — every later chunk still hashes identically —
which is exactly the shift-robustness fixed-stride segmenting
(corpus_segment_dedup's 8-word windows) lacks and the reason dedup
storage (and long-document near-dup at corpus scale) uses CDC.

Everything is one scan + per-doc windows + one chunk-hash shuffle:
posexplode the words, flag boundary words by md5 mask (expected chunk
length = _MASK words), running-sum the flags into chunk ids, reform
each chunk's text in-order, md5 it, and group corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.hashing import word32_sql
from stockpulse_spark.plans.registry import _r6, _register, _t

_MASK = 16  # boundary when word32(w) % 16 == 0 -> ~16-word chunks
_MIN_WORDS = 2  # ignore sub-chunk fragments shorter than this


def _chunk_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk-hash groups (one scan, per-doc boundary window, one
    chunk-hash shuffle) — split out unpinned so the plan-shape test can
    assert the window/shuffle structure that the builder's
    localCheckpoint pin hides from the outer explain."""
    tok = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("p0", "word"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            "word",
            F.when(
                F.expr(word32_sql("word")) % _MASK == 0, 1
            ).otherwise(0).alias("bnd"),
        )
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ch = tok.withColumn("chunk_id", F.sum("bnd").over(wc))
    chunks = (
        ch.groupBy("doc_id", "chunk_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "word"))
                        ),
                        lambda s: s.getField("word"),
                    ),
                )
            ).alias("h"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") >= _MIN_WORDS)
    )
    return chunks.groupBy("h").agg(
        F.max("n_words").alias("n_words"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


@_register(
    "content_defined_chunk_dedup",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL AND text <> ''
    ), tok AS (
      SELECT doc_id, u.pos AS pos, u.word AS word,
             CASE WHEN {word32_sql('u.word')} % {_MASK} = 0
                  THEN 1 ELSE 0 END AS bnd
      FROM (
        SELECT doc_id,
               unnest(list_transform(w,
                      (x, i) -> {{'pos': i, 'word': x}})) AS u
        FROM ws
      )
    ), ch AS (
      SELECT doc_id, pos, word,
             SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS chunk_id
      FROM tok
    ), chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(word, ' ' ORDER BY pos)) AS h,
             COUNT(*) AS n_words
      FROM ch GROUP BY doc_id, chunk_id
      HAVING COUNT(*) >= {_MIN_WORDS}
    ), grp AS (
      SELECT h, MAX(n_words) AS n_words,
             COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_occurrences
      FROM chunks GROUP BY h
    )
    SELECT h AS chunk_hash,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_occurrences AS BIGINT) AS n_occurrences,
           ROUND(n_words * (n_occurrences - 1) * 1.0 /
                 (SELECT SUM(n_words * n_occurrences) FROM grp), 6)
             AS dedupable_mass_share
    FROM grp WHERE n_docs >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash
    LIMIT 20
    """,
    tags=("llmdata", "dedup", "window"),
    doc="Content-defined chunk dedup: word-hash-mask boundaries "
    f"(expected {_MASK}-word chunks) make chunk identity "
    "shift-robust — a one-word insertion re-chunks one chunk, not "
    "the document tail — then chunks dedupe corpus-wide by md5. "
    "Top-20 cross-document chunks with the share of corpus word "
    "mass that deduplicating each would reclaim. One scan, two "
    "per-doc windows (boundary cumsum, in-order reform), one "
    "chunk-hash shuffle — the CDC storage-dedup plan, and the "
    "long-document complement to fixed-stride corpus_segment_dedup.",
)
def q_content_defined_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin once per invocation: the dedupable-mass total and the
    # n_docs>=2 report branch both read this frame — unpinned, the
    # whole chunk pipeline (posexplode + boundary window + two aggs)
    # executed twice (optimization r11). The pinned frame is four
    # narrow columns per distinct chunk hash.
    grp = _chunk_groups(spark, sf_dir).localCheckpoint(eager=False)
    tot = grp.agg(
        F.sum(F.col("n_words") * F.col("n_occurrences")).alias("tot")
    )
    return (
        grp.filter(F.col("n_docs") >= 2)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("h").alias("chunk_hash"),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            _r6(
                F.col("n_words")
                * (F.col("n_occurrences") - 1)
                * 1.0
                / F.col("tot")
            ).alias("dedupable_mass_share"),
        )
        .orderBy(
            F.desc("n_docs"), F.desc("n_occurrences"), "chunk_hash"
        )
        .limit(20)
    )
