"""Text-analysis operators: tokenization stats, quality scoring,
language ID, fingerprinting. All pure Column expressions (whole-stage
codegen; zero Python in the row path) — at 100 TB these run at scan
speed with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID (public common function words)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "los", "y", "que", "de", "un"),
    "fr": ("le", "la", "et", "les", "des", "un", "une"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}

# BPE-ish token pattern: letter runs, digit runs, single symbols
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def words(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus → plain split)."""
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """Approximate BPE token count via the letters/digits/symbol regex."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens that are in the stopword list (JVM-side array
    filter, no UDF)."""
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(text), lambda w: F.array_contains(arr, w)))


def quality_features(text: Column) -> dict[str, Column]:
    """Reference-style quality signals: length, punctuation ratio,
    stopword ratio, mean word length, uniqueness."""
    w = words(text)
    n_words = F.size(w)
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    n_stop = stopword_hits(text, LANG_STOPWORDS["en"])
    n_unique = F.size(F.array_distinct(w))
    # nullif guards: an empty text has n_chars = 0 (ANSI divide error);
    # ratios of a zero-length text are undefined -> NULL, and the
    # oracles mirror with nullif(n_chars, 0) / nullif(n_words, 0)
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "punct_ratio": n_punct / F.nullif(n_chars, F.lit(0)),
        "stopword_ratio": n_stop / F.nullif(n_words, F.lit(0)),
        "mean_word_len": (n_chars - (n_words - 1))
        / F.nullif(n_words, F.lit(0)),
        "unique_ratio": n_unique / F.nullif(n_words, F.lit(0)),
    }


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality score: rewards reasonable length,
    stopword presence, and vocabulary diversity — the shape of the
    heuristics used by public corpus-cleaning pipelines (C4/Gopher
    rules), reduced to an expressible formula."""
    f = quality_features(text)
    len_term = F.least(f["n_words"] / F.lit(100.0), F.lit(1.0))
    return (
        0.4 * len_term + 0.3 * f["stopword_ratio"] + 0.3 * f["unique_ratio"]
    )


def lang_hits(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_guess(text: Column) -> Column:
    """argmax over per-language stopword hits; ties break to the
    alphabetically-first language (deterministic, oracle-matchable)."""
    hits = lang_hits(text)
    m = F.greatest(*hits.values())
    expr = F.lit("unknown")
    # build the CASE in reverse alphabetical order so the first
    # alphabetical match wins
    for lang in sorted(hits, reverse=True):
        expr = F.when(hits[lang] == m, F.lit(lang)).otherwise(expr)
    return F.when(m == 0, F.lit("unknown")).otherwise(expr)


def fingerprint(text: Column, shingle_n: int = 3) -> dict[str, Column]:
    """Document fingerprints: full-text md5 + min-shingle hash (a
    1-permutation MinHash usable as a cheap near-dup bucket)."""
    from stockpulse_spark.llmdata.dedup import shingles as _shingles

    sh = _shingles(text, shingle_n)
    return {
        "md5": F.md5(F.encode(text, "utf-8")),
        "min_shingle_hash": F.array_min(
            F.transform(sh, lambda s: F.md5(F.encode(s, "utf-8")))
        ),
    }


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two-stage select: tokenize ONCE into a materialized array column,
    then derive every feature from it — a single-select version splits
    the text 10+ times (per-language filters, counts, distinct,
    shingles) because common-subexpression elimination doesn't span
    independent expression trees."""
    t = F.col(text_col)
    w = F.col("__words")
    staged = df.select(
        "*",
        words(t).alias("__words"),
        F.length(t).alias("n_chars"),
        token_count_bpe(t).alias("token_count_bpe"),
        F.length(F.regexp_replace(t, "[a-zA-Z0-9 ]", "")).alias("__n_punct"),
        F.md5(F.encode(t, "utf-8")).alias("fp_md5"),
    )

    def hits(stopwords: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(s) for s in stopwords])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    n_words = F.size(w)
    lang_hit_cols = {lang: hits(sw) for lang, sw in LANG_STOPWORDS.items()}
    staged = staged.select(
        "*",
        n_words.alias("n_words"),
        hits(LANG_STOPWORDS["en"]).alias("__n_stop"),
        F.size(F.array_distinct(w)).alias("__n_unique"),
        *[c.alias(f"__h_{lang}") for lang, c in lang_hit_cols.items()],
        F.array_min(
            F.transform(
                F.when(F.size(w) < 3, F.array().cast("array<string>")).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 2),
                        lambda i: F.concat_ws(" ", F.slice(w, i, 3)),
                    )
                ),
                lambda s: F.md5(F.encode(s, "utf-8")),
            )
        ).alias("fp_min_shingle"),
    )

    m = F.greatest(*[F.col(f"__h_{lang}") for lang in LANG_STOPWORDS])
    guess = F.lit("unknown")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        guess = F.when(F.col(f"__h_{lang}") == m, F.lit(lang)).otherwise(guess)
    guess = F.when(m == 0, F.lit("unknown")).otherwise(guess)

    # nullif: empty text (n_chars = 0) must yield NULL ratios, not an
    # ANSI divide error — mirrored in the oracles
    nw = F.nullif(F.col("n_words"), F.lit(0))
    sw_ratio = F.col("__n_stop") / nw
    uq_ratio = F.col("__n_unique") / nw
    out = staged.select(
        "*",
        F.col("n_words").alias("token_count_ws"),
        (F.col("__n_punct") / F.nullif(F.col("n_chars"), F.lit(0))).alias(
            "punct_ratio"
        ),
        sw_ratio.alias("stopword_ratio"),
        ((F.col("n_chars") - (F.col("n_words") - 1)) / nw).alias(
            "mean_word_len"
        ),
        uq_ratio.alias("unique_ratio"),
        (
            0.4 * F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
            + 0.3 * sw_ratio
            + 0.3 * uq_ratio
        ).alias("quality_score"),
        guess.alias("lang_guess"),
    )
    return out.drop(
        "__words", "__n_punct", "__n_stop", "__n_unique",
        *[f"__h_{lang}" for lang in LANG_STOPWORDS],
    )
