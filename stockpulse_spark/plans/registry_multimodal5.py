"""Cross-modal curation pipeline — the capstone composing the text
gate, the image gate, and byte-level exact image dedup into ONE
declarative plan, the way a real multimodal training set is cut.

Stages (each independently oracle-checked by its standalone query):
1. text gate: the LANGUAGE-AGNOSTIC Gopher rule subset — word-count
   bounds, mean word length, alphabetic-word fraction — computed by
   the same gopher_metrics helper / SQL fragment as
   gopher_quality_rules (one definition each side). The
   English-prose rules (stop-words, symbols, bullets) are
   deliberately NOT applied: the corpus is multilingual and the
   stop-word rule alone would zero it — exactly the per-corpus
   gate-tuning decision a real pipeline makes, and the full rule
   table stays observable via gopher_quality_rules;
2. image gate: the document's PNG must REALLY decode (mapInPandas,
   zlib inflate + unfilter + CRC walk) and be at least 8x8 — the
   "broken or tiny thumbnail" drop every image-text pipeline runs;
3. exact image dedup: keep the LOWEST doc_id per md5(payload) —
   genuine byte-level dedup over the encoded container.

The oracle never sees a byte. For stage 2 it evaluates the payload
generator's closed-form dimensions; for stage 3 it exploits the
generator's number theory: two docs' PNGs are byte-identical IFF
doc_id1 = doc_id2 (mod 256) (dimensions depend on d mod 32, every
pixel on d mod 256, and the encoder is deterministic), so
md5-equality groups ARE the d%256 residue classes. Agreement between
the engines is therefore a proof that the Spark side's real
encode -> md5 path partitions the corpus exactly as the arithmetic
says it must — the strongest cross-check in the multimodal suite.

At 100 TB: stage 1 is scan-local, stage 2 one Arrow kernel pass,
stage 3 one shuffle on the 16-byte digest (the md5 window is
per-digest-group, bounded by duplicate multiplicity, never global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.multimodal import (
    attach_png_payload,
    extract_png_features,
)
from stockpulse_spark.plans.registry import _register, _t
from stockpulse_spark.plans.registry_curation4 import (
    GOPHER_M_SQL,
    gopher_metrics,
)


@_register(
    "multimodal_curation_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source,
             string_split(text, ' ') AS w,
             string_split(text, chr(10)) AS ln
      FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ), m AS (
      {GOPHER_M_SQL.format(cols="doc_id, source")}
    ), text_gated AS (
      SELECT doc_id, source, n_words FROM m
      WHERE n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3 AND 10
        AND alpha_frac > 0.8
    ), img_gated AS (
      SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words,
             CAST(doc_id % 32 + 4 AS BIGINT) AS img_w,
             CAST((doc_id * 7) % 32 + 4 AS BIGINT) AS img_h,
             doc_id % 256 AS img_class
      FROM text_gated
      WHERE doc_id % 32 + 4 >= 8 AND (doc_id * 7) % 32 + 4 >= 8
    )
    SELECT doc_id, source, n_words, img_w, img_h
    FROM (
      SELECT *, MIN(doc_id) OVER (PARTITION BY img_class) AS keeper
      FROM img_gated
    ) WHERE doc_id = keeper
    ORDER BY doc_id
    """,
    tags=("llmdata", "multimodal", "pipeline", "composition"),
    doc="multimodal training-set cut in ONE plan: language-agnostic "
    "Gopher rule subset (scan-local; the multilingual-corpus gate "
    "tuning) -> real PNG decode gate >= 8x8 (Arrow kernel; "
    "decode failures dead-letter out) -> byte-exact image dedup "
    "(min doc_id per md5(payload), one digest shuffle). The oracle "
    "replays stages 2-3 from the generator's closed form (dims from "
    "d mod 32, byte-identity IFF d1 = d2 mod 256) — cross-engine "
    "agreement proves the real encode/decode/digest path honors the "
    "arithmetic.",
)
def q_multimodal_curation_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select("doc_id", "source", "text")
    )
    text_gated = (
        gopher_metrics(d, "doc_id", "source")
        .filter(
            F.col("n_words").between(50, 100000)
            & F.col("mean_word_len").between(3, 10)
            & (F.col("alpha_frac") > 0.8)
        )
        .select("doc_id", "source", F.col("n_words").cast("long"))
    )

    payloads = attach_png_payload(text_gated.select("doc_id"))
    feats = extract_png_features(payloads).filter(
        F.col("decode_ok")
        & (F.col("width") >= 8)
        & (F.col("height") >= 8)
    )
    digests = payloads.select(
        "doc_id", F.md5(F.col("payload")).alias("img_md5")
    )
    img_gated = (
        text_gated.join(feats.select("doc_id", "width", "height"), "doc_id")
        .join(digests, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_words",
            F.col("width").cast("long").alias("img_w"),
            F.col("height").cast("long").alias("img_h"),
            "img_md5",
        )
    )
    keeper = F.min("doc_id").over(Window.partitionBy("img_md5"))
    return (
        img_gated.withColumn("keeper", keeper)
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "source", "n_words", "img_w", "img_h")
        .orderBy("doc_id")
    )
