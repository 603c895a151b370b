"""Round-6 curation wave: the two classic corpus-filter signals the
suite did not yet carry.

- Gopher quality rules (Rae et al. 2021, MassiveWeb appendix A1.1):
  the seven named document heuristics — word-count bounds, mean word
  length, symbol-to-word ratio, bullet/ellipsis line fractions,
  alphabetic-word fraction, stop-word presence — as one per-document
  rule table with a combined keep flag.  This is the gate every
  large-scale text pipeline runs BEFORE dedup; the existing
  doc_quality_filter covers length/stopword ratios, this adds the
  full named rule set with per-rule observability.
- duplicated-n-gram coverage (Lee et al. 2021 "Deduplicating Training
  Data Makes Language Models Better"): per document, the fraction of
  its 8-gram POSITIONS (with multiplicity) whose gram occurs in >= 2
  distinct documents corpus-wide.  Distinct from doc_ngram_novelty
  (first-seen attribution over DISTINCT grams): this is the
  exact-substring-dedup signal — how much of *this* document is
  corpus-duplicated text, the per-doc number a substring-dedup pass
  would remove.

Reference parity: the reference's pipeline has no corpus curation
layer (its quality ops are the row-level numeric filters of
processing/data_processor.py); these extend the training-data surface
the brief asks for beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t

# The Gopher stop-word list (Rae et al. A1.1) — presence of >= 2 is
# the "is this prose at all" rule.
_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_STOPS_SQL = ", ".join(f"'{s}'" for s in _STOPS)


# The gopher metric + keep SQL, shared with the multimodal curation
# pipeline (registry_multimodal5) so the rule set has exactly one SQL
# definition too. Expects a CTE `base(..., w, ln)`; `{cols}` is the
# carried-through column list.
GOPHER_M_SQL = f"""
      SELECT {{cols}},
             len(w) AS n_words,
             list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w)
               AS mean_word_len,
             len(list_filter(w, x -> contains(x, '#')
                                  OR contains(x, '...')
                                  OR contains(x, '…'))) * 1.0 / len(w)
               AS symbol_ratio,
             len(list_filter(ln, l -> starts_with(ltrim(l), '-')
                                   OR starts_with(ltrim(l), '*')
                                   OR starts_with(ltrim(l), '•')))
               * 1.0 / len(ln) AS bullet_frac,
             len(list_filter(ln, l -> ends_with(rtrim(l), '...')
                                   OR ends_with(rtrim(l), '…')))
               * 1.0 / len(ln) AS ellipsis_frac,
             len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               * 1.0 / len(w) AS alpha_frac,
             len(list_filter([{_STOPS_SQL}],
                             s -> list_contains(w, s))) AS n_stop
      FROM base
"""

GOPHER_KEEP_SQL = """(n_words BETWEEN 50 AND 100000
                      AND mean_word_len BETWEEN 3 AND 10
                      AND symbol_ratio < 0.1
                      AND bullet_frac < 0.9
                      AND ellipsis_frac < 0.3
                      AND alpha_frac > 0.8
                      AND n_stop >= 2)"""


@_register(
    "gopher_quality_rules",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             string_split(text, chr(10)) AS ln
      FROM documents WHERE text IS NOT NULL
    ), m AS (
      {GOPHER_M_SQL.format(cols="doc_id")}
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(symbol_ratio, 6) AS symbol_ratio,
           ROUND(bullet_frac, 6) AS bullet_frac,
           ROUND(ellipsis_frac, 6) AS ellipsis_frac,
           ROUND(alpha_frac, 6) AS alpha_frac,
           CAST(n_stop AS BIGINT) AS n_stop,
           CAST(CASE WHEN {GOPHER_KEEP_SQL}
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM m ORDER BY doc_id
    """,
    tags=("llmdata", "text", "quality", "pipeline"),
    doc="Gopher quality rules (Rae et al. 2021 A1.1): the seven named "
    "document heuristics as a per-doc rule table plus combined keep "
    "flag. Pure Column/lambda expressions over the in-row token and "
    "line arrays — zero shuffles before the final sort, so the gate "
    "is embarrassingly parallel at any corpus size (the rule that "
    "matters at 100 TB: a quality gate must cost one scan, nothing "
    "more). Rule comparisons run on UNROUNDED doubles on both "
    "engines (int/int division is exactly reproducible); rounding "
    "is display-only.",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    m = gopher_metrics(d, "doc_id")
    return m.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        _r6(F.col("mean_word_len")).alias("mean_word_len"),
        _r6(F.col("symbol_ratio")).alias("symbol_ratio"),
        _r6(F.col("bullet_frac")).alias("bullet_frac"),
        _r6(F.col("ellipsis_frac")).alias("ellipsis_frac"),
        _r6(F.col("alpha_frac")).alias("alpha_frac"),
        F.col("n_stop").cast("long").alias("n_stop"),
        "keep",
    ).orderBy("doc_id")


def gopher_metrics(df: DataFrame, *keep_cols: str) -> DataFrame:
    """The seven Gopher metric columns (n_words, mean_word_len,
    symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac, n_stop —
    all UNROUNDED) plus the combined 0/1 `keep` flag, with
    `keep_cols` carried through.  Shared by gopher_quality_rules and
    the multimodal curation pipeline so the rule set has exactly one
    definition."""
    w = F.split("text", " ")
    ln = F.split("text", "\n")
    base = df.select(*keep_cols, w.alias("w"), ln.alias("ln"))
    n_words = F.size("w")
    mean_word_len = (
        F.expr("aggregate(w, 0L, (a, x) -> a + length(x))") * 1.0 / n_words
    )
    symbol_ratio = (
        F.size(
            F.expr(
                "filter(w, x -> contains(x, '#') OR contains(x, '...') "
                "OR contains(x, '…'))"
            )
        )
        * 1.0
        / n_words
    )
    bullet_frac = (
        F.size(
            F.expr(
                "filter(ln, l -> startswith(ltrim(l), '-') "
                "OR startswith(ltrim(l), '*') "
                "OR startswith(ltrim(l), '•'))"
            )
        )
        * 1.0
        / F.size("ln")
    )
    ellipsis_frac = (
        F.size(
            F.expr(
                "filter(ln, l -> endswith(rtrim(l), '...') "
                "OR endswith(rtrim(l), '…'))"
            )
        )
        * 1.0
        / F.size("ln")
    )
    alpha_frac = (
        F.size(F.expr("filter(w, x -> x rlike '[A-Za-z]')")) * 1.0 / n_words
    )
    stops_arr = F.array(*[F.lit(s) for s in _STOPS])
    n_stop = F.size(F.filter(stops_arr, lambda s: F.array_contains("w", s)))
    m = base.select(
        *keep_cols,
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stop"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("bullet_frac") < 0.9)
        & (F.col("ellipsis_frac") < 0.3)
        & (F.col("alpha_frac") > 0.8)
        & (F.col("n_stop") >= 2)
    )
    return m.withColumn(
        "keep", F.when(keep, 1).otherwise(0).cast("long")
    )


@_register(
    "duplicate_gram_coverage",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      -- 8-gram POSITIONS with multiplicity (no DISTINCT): coverage
      -- measures how much of the document's surface is duplicated,
      -- so a doc that repeats a shared slogan 10 times counts 10
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 6),
                    i -> array_to_string(w[i:i+7], ' '))) AS g
      FROM ws WHERE len(w) >= 8
    ), docfreq AS (
      SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g
    )
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           ROUND(SUM(CASE WHEN df.nd >= 2 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS dup_coverage
    FROM grams gr JOIN docfreq df ON gr.g = df.g
    GROUP BY gr.doc_id ORDER BY gr.doc_id
    """,
    tags=("llmdata", "text", "dedup"),
    doc="exact-substring-dedup signal (Lee et al. 2021): per document, "
    "the fraction of its word-8-gram positions (with multiplicity) "
    "whose gram occurs in >= 2 distinct documents. Two shuffles — "
    "one on the gram key (COUNT DISTINCT doc_id gets partial "
    "aggregation map-side) and the re-join back, then the per-doc "
    "agg; never all-pairs. At 100 TB the gram string is the shuffle "
    "key — production would key on xxhash64(gram) to shrink shuffle "
    "width (collision odds ~n²/2⁶⁴, acceptable for a coverage "
    "STATISTIC); kept as the raw string here so the DuckDB oracle "
    "is hash-function-free. Distinct from doc_ngram_novelty: that "
    "attributes DISTINCT grams to first-seen docs, this measures "
    "duplicated surface per doc.",
)
def q_duplicate_gram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 8)
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 7), "
                "i -> concat_ws(' ', slice(w, i, 8)))"
            )
        ).alias("g"),
    )
    docfreq = grams.groupBy("g").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        grams.join(docfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(dup).alias("n_dup"),
            _r6(
                F.sum(dup.cast("double")) / F.count(F.lit(1))
            ).alias("dup_coverage"),
        )
        .orderBy("doc_id")
    )
