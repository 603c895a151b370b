"""Training-data pipeline operators over `documents` — the steps
between a cleaned corpus and a tokenizer-ready dataset: chunking,
sequence packing, deterministic stratified sampling, and rule-based
quality filtering. All pure Column expressions (whole-stage codegen,
zero Python in the row path) with exact DuckDB oracles.

Scale notes: chunking is a per-row explode (no shuffle); packing is
one window per source partition; sampling is stateless hash math at
scan speed; the filter is a scan-level predicate — every one of these
runs at 100 TB as a map-side pass except packing's single sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.hashing import word32_sql
from stockpulse_spark.operators.rank import with_grouped_running_sum
from stockpulse_spark.plans.registry import _r6, _register, _t

# chunking parameters: 32-word chunks, 8-word overlap → stride 24
_CHUNK, _STRIDE = 32, 24
_PACK_BUDGET = 512  # tokens per packed sequence

_NW = "len(string_split(text, ' '))"


@_register(
    "doc_chunking",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, text, {_NW} AS n,
             unnest(range(1, {_NW} + 1, {_STRIDE})) AS st
      FROM documents
    )
    SELECT doc_id,
           CAST((st - 1) / {_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(least({_CHUNK}, n - st + 1) AS INTEGER) AS n_tokens,
           array_to_string((string_split(text, ' '))[st:st + {_CHUNK} - 1], ' ')
             AS chunk_text
    FROM ex
    """,
    tags=("llmdata", "pipeline"),
    doc=f"fixed-size document chunking with overlap ({_CHUNK}-word "
    f"chunks, {_STRIDE}-word stride): sequence() of chunk starts → "
    "explode → slice. The canonical pre-tokenization step for "
    "long-document training data. Pure narrow transformation — no "
    "shuffle at any scale; output rows ≈ input tokens / stride.",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split("text", " ")
    n = F.size(w)
    ex = d.select(
        "doc_id",
        "text",
        n.alias("n"),
        F.explode(F.sequence(F.lit(1), n, F.lit(_STRIDE))).alias("st"),
    )
    w2 = F.split("text", " ")
    return ex.select(
        "doc_id",
        ((F.col("st") - 1) / _STRIDE).cast("int").alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("st") + 1)
        .cast("int")
        .alias("n_tokens"),
        F.concat_ws(" ", F.slice(w2, F.col("st"), F.lit(_CHUNK))).alias(
            "chunk_text"
        ),
    )


@_register(
    "doc_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_NW} AS n_tokens FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS pack_id,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack
    FROM c
    """,
    tags=("llmdata", "pipeline"),
    doc=f"greedy sequence packing (concat-then-split at a "
    f"{_PACK_BUDGET}-token budget): exclusive running token count per "
    "source stream → pack_id = cum/budget, offset = cum%budget — the "
    "standard streaming packer that wastes at most one document "
    "boundary per pack. Integer arithmetic end-to-end so the oracle "
    "is bit-exact. The exclusive cumsum rides "
    "operators/rank.py::with_grouped_running_sum (range repartition "
    "on (source, doc_id) + per-group prefix offsets): a plain "
    "SUM OVER (PARTITION BY source) caps parallelism at |sources| — "
    "~20 tasks each sorting a twentieth of a 100 TB corpus — while "
    "the grouped prefix form keeps every partition a task.",
)
def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    c = with_grouped_running_sum(
        toks,
        ["source"],
        ["doc_id"],
        "n_tokens",
        out_col="cum_before",
        inclusive=False,
    )
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("cum_before") / _PACK_BUDGET).alias("pack_id"),
        (F.col("cum_before") % _PACK_BUDGET).alias("offset_in_pack"),
    )


_SAMPLE_HASH = word32_sql("concat('sample|', CAST(doc_id AS VARCHAR(20)))")
# per-stratum keep rate in percent: 5..95 derived from the source number
_RATE = "(10 * (CAST(substr(source, 4, 8) AS INTEGER) % 10) + 5)"


@_register(
    "doc_stratified_sample",
    oracle=f"""
    SELECT doc_id, source,
           CAST({_RATE} AS INTEGER) AS keep_pct
    FROM documents
    WHERE {_SAMPLE_HASH} % 100 < {_RATE}
    """,
    tags=("llmdata", "pipeline", "sampling"),
    doc="deterministic stratified sampling: per-source keep rates "
    "(5%-95%, derived from the source id) applied via an md5-derived "
    "32-bit hash of the doc id — reproducible across engines, runs, "
    "and partitionings, unlike rand()-based sampling. The standard "
    "way a training mix downweights a crawl and upweights curated "
    "sources. Stateless scan-speed predicate; no shuffle.",
)
def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    h = F.expr(_SAMPLE_HASH)
    rate = F.expr(_RATE)
    return d.filter((h % 100) < rate).select(
        "doc_id", "source", rate.cast("int").alias("keep_pct")
    )


@_register(
    "doc_quality_filter",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             {_NW} AS n_words,
             length(text) AS n_chars,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains(['the','a','of','and','to','is','in'], w)))
               AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_unique
      FROM documents
    ), r AS (
      -- nullif mirrors the Spark quality_features guards (empty text);
      -- every rule boolean coalesces to FALSE: a doc with undefined
      -- ratios does not pass, deterministically, on both engines
      SELECT doc_id, n_words,
             (n_chars - (n_words - 1)) / nullif(n_words, 0) AS mean_word_len,
             n_punct / nullif(n_chars, 0) AS punct_ratio,
             n_stop / nullif(n_words, 0) AS stop_ratio,
             n_unique / nullif(n_words, 0) AS unique_ratio
      FROM f
    )
    SELECT doc_id,
           n_words,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(punct_ratio, 6) AS punct_ratio,
           ROUND(stop_ratio, 6) AS stop_ratio,
           ROUND(unique_ratio, 6) AS unique_ratio,
           coalesce(n_words BETWEEN 10 AND 10000, FALSE) AS r_len,
           coalesce(mean_word_len BETWEEN 2 AND 12, FALSE) AS r_word_len,
           coalesce(stop_ratio >= 0.03, FALSE) AS r_stop,
           coalesce(punct_ratio <= 0.3, FALSE) AS r_punct,
           coalesce(unique_ratio >= 0.3, FALSE) AS r_unique,
           coalesce((n_words BETWEEN 10 AND 10000)
             AND (mean_word_len BETWEEN 2 AND 12)
             AND stop_ratio >= 0.03
             AND punct_ratio <= 0.3
             AND unique_ratio >= 0.3, FALSE) AS passes
    FROM r
    """,
    tags=("llmdata", "pipeline", "quality"),
    doc="rule-based corpus filtering in the shape of the public "
    "Gopher/C4 cleaning rules: word-count bounds, mean-word-length "
    "band, minimum stopword ratio, punctuation cap, uniqueness floor "
    "— each rule surfaced as its own boolean (so a pipeline can audit "
    "WHY a document fell out) plus the conjunction. Rule predicates "
    "evaluate on unrounded doubles identically in both engines; "
    "displayed ratios rounded. Scan-level predicate at any scale.",
)
def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.textstats import quality_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    f = quality_features(F.col("text"))
    r_len = f["n_words"].between(10, 10000)
    r_word_len = f["mean_word_len"].between(2, 12)
    r_stop = f["stopword_ratio"] >= 0.03
    r_punct = f["punct_ratio"] <= 0.3
    r_unique = f["unique_ratio"] >= 0.3
    return d.select(
        "doc_id",
        f["n_words"].cast("long").alias("n_words"),
        _r6(f["mean_word_len"]).alias("mean_word_len"),
        _r6(f["punct_ratio"]).alias("punct_ratio"),
        _r6(f["stopword_ratio"]).alias("stop_ratio"),
        _r6(f["unique_ratio"]).alias("unique_ratio"),
        F.coalesce(r_len, F.lit(False)).alias("r_len"),
        F.coalesce(r_word_len, F.lit(False)).alias("r_word_len"),
        F.coalesce(r_stop, F.lit(False)).alias("r_stop"),
        F.coalesce(r_punct, F.lit(False)).alias("r_punct"),
        F.coalesce(r_unique, F.lit(False)).alias("r_unique"),
        F.coalesce(
            r_len & r_word_len & r_stop & r_punct & r_unique, F.lit(False)
        ).alias("passes"),
    )


@_register(
    "training_data_pipeline",
    oracle=f"""
    WITH passed AS (
      SELECT doc_id, source, text FROM documents
      WHERE {_NW} BETWEEN 10 AND 10000
        AND (length(text) - ({_NW} - 1)) / {_NW} BETWEEN 2 AND 12
        AND len(list_filter(string_split(text, ' '),
              w -> list_contains(['the','a','of','and','to','is','in'], w)))
            / {_NW} >= 0.03
        AND length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
            / length(text) <= 0.3
        AND len(list_distinct(string_split(text, ' '))) / {_NW} >= 0.3
    ), kept AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM passed
      ) WHERE rn = 1
    ), sampled AS (
      SELECT doc_id, source, text FROM kept
      WHERE {_SAMPLE_HASH} % 100 < {_RATE}
    ), chunks AS (
      SELECT doc_id, source,
             CAST((st - 1) / {_STRIDE} AS INTEGER) AS chunk_idx,
             CAST(least({_CHUNK}, n - st + 1) AS BIGINT) AS n_tokens
      FROM (
        SELECT doc_id, source, text, {_NW} AS n,
               unnest(range(1, {_NW} + 1, {_STRIDE})) AS st
        FROM sampled
      )
    ), packed AS (
      SELECT doc_id, source, chunk_idx, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM chunks
    )
    SELECT doc_id, source, chunk_idx, n_tokens,
           CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS pack_id,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack
    FROM packed
    """,
    tags=("llmdata", "pipeline", "composition"),
    doc="the COMPLETE training-data pipeline as ONE declarative plan: "
    "quality-rule filter (scan-level predicate) → exact dedup keeper "
    "(one shuffle on the md5 key) → deterministic stratified sample "
    "(stateless hash predicate) → overlapping chunking (narrow "
    "explode) → greedy sequence packing (one window per source). "
    "Catalyst fuses the filter/sample/chunk stages into the scan "
    "side of the dedup shuffle — five pipeline stages, two shuffles "
    "total. This is the composition a 100 TB corpus build actually "
    "runs; every stage is individually oracle-checked above and the "
    "composition is oracle-checked here.",
)
def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.textstats import quality_features
    from stockpulse_spark.operators.dedup import dedup_keep_latest

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    f = quality_features(F.col("text"))
    passed = d.filter(
        f["n_words"].between(10, 10000)
        & f["mean_word_len"].between(2, 12)
        & (f["stopword_ratio"] >= 0.03)
        & (f["punct_ratio"] <= 0.3)
        & (f["unique_ratio"] >= 0.3)
    )
    # exact dedup, keeper = smallest doc_id per content hash
    kept = (
        dedup_keep_latest(
            passed.withColumn("__k", F.md5(F.encode("text", "utf-8"))).withColumn(
                "__neg", -F.col("doc_id")
            ),
            keys=["__k"],
            order_cols=["__neg"],
        )
        .drop("__k", "__neg")
    )
    sampled = kept.filter((F.expr(_SAMPLE_HASH) % 100) < F.expr(_RATE))
    w = F.split("text", " ")
    n = F.size(w)
    chunks = sampled.select(
        "doc_id",
        "source",
        n.alias("n"),
        F.explode(F.sequence(F.lit(1), n, F.lit(_STRIDE))).alias("st"),
    ).select(
        "doc_id",
        "source",
        ((F.col("st") - 1) / _STRIDE).cast("int").alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("st") + 1)
        .cast("long")
        .alias("n_tokens"),
    )
    packed = with_grouped_running_sum(
        chunks,
        ["source"],
        ["doc_id", "chunk_idx"],
        "n_tokens",
        out_col="cum_before",
        inclusive=False,
    )
    return packed.select(
        "doc_id",
        "source",
        "chunk_idx",
        "n_tokens",
        F.floor(F.col("cum_before") / _PACK_BUDGET).alias("pack_id"),
        (F.col("cum_before") % _PACK_BUDGET).alias("offset_in_pack"),
    )


# v2 pipeline: decontamination + temperature-budget sampling stages
_V2_BUDGET = 5_000  # global token budget for the curated sample
_V2_SHINGLES = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) - 4, 0) + 1), "
    "i -> array_to_string((string_split(text, ' '))[i:i+4], ' '))"
)
def _v2_oracle() -> str:
    from stockpulse_spark.llmdata.hashing import hex_to_int_sql

    bucket = f"{hex_to_int_sql('md5(text)')} % 100"
    return f"""
    WITH passed AS (
      SELECT doc_id, source, text FROM documents
      WHERE {_NW} BETWEEN 10 AND 10000
        AND (length(text) - ({_NW} - 1)) / {_NW} BETWEEN 2 AND 12
        AND len(list_filter(string_split(text, ' '),
              w -> list_contains(['the','a','of','and','to','is','in'], w)))
            / {_NW} >= 0.03
        AND length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
            / length(text) <= 0.3
        AND len(list_distinct(string_split(text, ' '))) / {_NW} >= 0.3
    ), kept AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM passed
      ) WHERE rn = 1
    ), b AS (
      SELECT doc_id, source, text, {bucket} AS bucket FROM kept
    ), eval_grams AS (
      SELECT DISTINCT md5(g) AS gh
      FROM b, unnest({_V2_SHINGLES}) AS t(g)
      WHERE bucket >= 90
    ), contaminated AS (
      SELECT DISTINCT tg.doc_id
      FROM (
        SELECT doc_id, md5(g) AS gh
        FROM b, unnest({_V2_SHINGLES}) AS t(g)
        WHERE bucket < 90
      ) tg JOIN eval_grams e ON tg.gh = e.gh
    ), clean AS (
      SELECT doc_id, source, text FROM b
      WHERE bucket < 90
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), per_src AS (
      SELECT source, SUM({_NW}) AS n_tokens FROM clean GROUP BY source
    ), raw AS (
      SELECT source,
             n_tokens * 1.0 / SUM(n_tokens) OVER () AS raw_share
      FROM per_src
    ), quota AS (
      SELECT source,
             CAST(floor({_V2_BUDGET} * pow(raw_share, 0.3)
                  / SUM(pow(raw_share, 0.3)) OVER ()) AS BIGINT) AS quota
      FROM raw
    ), cum AS (
      SELECT doc_id, source, text,
             SUM({_NW}) OVER (PARTITION BY source
               ORDER BY md5(text), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctoks
      FROM clean
    ), sampled AS (
      SELECT c.doc_id, c.source, c.text
      FROM cum c JOIN quota q USING (source)
      WHERE c.ctoks <= q.quota
    ), chunks AS (
      SELECT doc_id, source,
             CAST((st - 1) / {_STRIDE} AS INTEGER) AS chunk_idx,
             CAST(least({_CHUNK}, n - st + 1) AS BIGINT) AS n_tokens
      FROM (
        SELECT doc_id, source, text, {_NW} AS n,
               unnest(range(1, {_NW} + 1, {_STRIDE})) AS st
        FROM sampled
      )
    ), packed AS (
      SELECT doc_id, source, chunk_idx, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM chunks
    )
    SELECT doc_id, source, chunk_idx, n_tokens,
           CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS pack_id,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack
    FROM packed
    """


@_register(
    "training_data_pipeline_v2",
    oracle=_v2_oracle(),
    tags=("llmdata", "pipeline", "composition"),
    doc="the curated training-data pipeline v2, ONE declarative plan "
    "adding the two curation stages v1 lacks: quality filter -> exact "
    "dedup -> 5-gram DECONTAMINATION against the content-keyed "
    "held-out split (gram-hash semi-join, never all-pairs) -> "
    f"TEMPERATURE-BUDGET sampling ({_V2_BUDGET} tokens split by "
    "share^0.3 quotas, md5-priority integer cumsum) -> chunking -> "
    "packing. Catalyst still fuses the narrow stages; the additions "
    "cost one gram-hash shuffle plus source-sized quota broadcasts. "
    "Every stage is individually oracle-checked by its standalone "
    "query (doc_quality_filter, doc_dedup_exact, "
    "decontamination_overlap, doc_token_budget_sample, doc_chunking, "
    "doc_pack_sequences); the composition is oracle-checked here.",
)
def q_training_data_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.hashing import hex_to_int_sql
    from stockpulse_spark.llmdata.textstats import quality_features
    from stockpulse_spark.operators.dedup import dedup_keep_latest

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    f = quality_features(F.col("text"))
    passed = d.filter(
        f["n_words"].between(10, 10000)
        & f["mean_word_len"].between(2, 12)
        & (f["stopword_ratio"] >= 0.03)
        & (f["punct_ratio"] <= 0.3)
        & (f["unique_ratio"] >= 0.3)
    )
    kept = (
        dedup_keep_latest(
            passed.withColumn("__k", F.md5(F.encode("text", "utf-8")))
            .withColumn("__neg", -F.col("doc_id")),
            keys=["__k"],
            order_cols=["__neg"],
        )
        .drop("__k", "__neg")
    )
    # pin once per invocation: b (quality filter + exact-dedup window
    # + bucket) is read by the eval-gram pass, the contamination pass
    # and the clean anti-join — unpinned, the regex quality features
    # and the dedup window shuffle re-ran on every branch, and the
    # branch fan-out below multiplies that to ~9 executions
    # (optimization r11)
    b = kept.withColumn(
        "bucket", F.expr(hex_to_int_sql("md5(text)")) % 100
    ).localCheckpoint(eager=False)
    from stockpulse_spark.llmdata.dedup import word_ngrams

    # round 10: zip_with n-grams, md5 over the lambda variable only —
    # the old transform(sequence, slice) re-split the text per gram
    # position (interpreted HOF capture; see llmdata/dedup.word_ngrams)
    grams = F.transform(word_ngrams(F.col("text"), 5), lambda g: F.md5(g))
    eval_grams = (
        b.filter(F.col("bucket") >= 90)
        .select(F.explode(grams).alias("gh"))
        .distinct()
    )
    train = b.filter(F.col("bucket") < 90)
    contaminated = (
        train.select("doc_id", F.explode(grams).alias("gh"))
        .join(F.broadcast(eval_grams), "gh")
        .select("doc_id")
        .distinct()
    )
    # pin the decontaminated set too: the per-source token totals (via
    # quota) and the running-sum sampling pass both read it, and each
    # unpinned read re-ran the contamination join (optimization r11)
    clean = (
        train.join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=False)
    )
    toks = F.size(F.split("text", " "))
    per_src = clean.groupBy("source").agg(F.sum(toks).alias("n_tokens"))
    wall = Window.partitionBy()
    raw = per_src.select(
        "source",
        (F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(wall)).alias(
            "raw_share"
        ),
    )
    quota = raw.select(
        "source",
        F.floor(
            _V2_BUDGET
            * F.pow("raw_share", 0.3)
            / F.sum(F.pow("raw_share", 0.3)).over(wall)
        )
        .cast("bigint")
        .alias("quota"),
    )
    # both cumsums ride the grouped prefix decomposition — a plain
    # SUM OVER (PARTITION BY source) caps parallelism at |sources|
    cum = with_grouped_running_sum(
        clean.select(
            "doc_id",
            "source",
            "text",
            toks.alias("__tk"),
            F.md5("text").alias("__ord"),
        ),
        ["source"],
        ["__ord", "doc_id"],
        "__tk",
        out_col="ctoks",
        inclusive=True,
    )
    sampled = (
        cum.join(F.broadcast(quota), "source")
        .filter(F.col("ctoks") <= F.col("quota"))
        .select("doc_id", "source", "text")
    )
    w = F.split("text", " ")
    n = F.size(w)
    chunks = sampled.select(
        "doc_id",
        "source",
        n.alias("n"),
        F.explode(F.sequence(F.lit(1), n, F.lit(_STRIDE))).alias("st"),
    ).select(
        "doc_id",
        "source",
        ((F.col("st") - 1) / _STRIDE).cast("int").alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("st") + 1)
        .cast("long")
        .alias("n_tokens"),
    )
    packed = with_grouped_running_sum(
        chunks,
        ["source"],
        ["doc_id", "chunk_idx"],
        "n_tokens",
        out_col="cum_before",
        inclusive=False,
    )
    return packed.select(
        "doc_id",
        "source",
        "chunk_idx",
        "n_tokens",
        F.floor(F.col("cum_before") / _PACK_BUDGET).alias("pack_id"),
        (F.col("cum_before") % _PACK_BUDGET).alias("offset_in_pack"),
    )
