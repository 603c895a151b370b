"""Training-data operator registrations over documents/embeddings
(north-star M5: dedup families, similarity search, text analysis,
multimodal plumbing). Every query keeps a DuckDB oracle: hashes are
md5 (identical in both engines), folds are sequential in both, planes
are shared literals.

Near-dup queries run over a corpus + mutated-copy union (drop the last
5 words; residue-class ids: original = 2i, mutation = 2i+1, so the
synthetic ids can never collide with input ids at any corpus scale)
built identically on both sides, so the dedup operators demonstrably
FIND the planted near-duplicates instead of vacuously returning zero
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import (
    exact_dedup,
    exact_jaccard_pairs_inverted_from_shingles,
    minhash_lsh_pairs,
    minhash_lsh_pairs_from_shingles,
    ngram_jaccard_pairs,
    shingles,
    simhash32,
)
from stockpulse_spark.llmdata.hashing import word32_sql
from stockpulse_spark.llmdata.multimodal import (
    attach_image_payload,
    extract_media_metadata,
)
from stockpulse_spark.llmdata.similarity import (
    cosine_topk,
    pseudo_planes,
    srp_lsh_topk,
)
from stockpulse_spark.llmdata.textstats import (
    LANG_STOPWORDS,
    TOKEN_PATTERN,
    add_text_stats,
)
from stockpulse_spark.plans.registry import _r6, _register, _t

# ---------------------------------------------------------------------------
# shared corpus construction (Spark + SQL sides must match exactly)


def _mutated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-dup copies (last 5 words dropped; residue-class
    ids — original = 2*id, mutation = 2*id+1 — so synthetic ids can
    never collide with input ids at ANY corpus scale).

    Repartitioned to the session parallelism: the documents parquet is
    a single small file → 1-2 scan partitions, which would pin the
    16×md5 shingle transforms to 2 cores. One cheap shuffle of raw
    text buys full-width parallelism for the hash-heavy stages (at
    production scale the input arrives in many files and this becomes
    a no-op knob).
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = F.split("text", " ")
    # greatest(…, 0): a doc under 6 words would feed slice() a negative
    # length (runtime error); DuckDB's l[1:n] clamps to empty, so the
    # guard keeps the engines aligned. NULL text stays NULL (concat_ws
    # would silently turn it into '' while array_to_string keeps NULL).
    # residue-class synthetic ids (original = 2*id, mutation = 2*id+1):
    # collision-free for ANY input id range, unlike the additive
    # +1000000 offset this replaced — the 100x decade smoke caught the
    # offset colliding with replica ids (a collided empty-shingle doc
    # turned a jaccard denominator to 0: DIVIDE_BY_ZERO at scale)
    orig = d.select(
        (F.col("doc_id") * 2).alias("doc_id"), "source", "text"
    )
    mut = d.select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        "source",
        F.when(
            F.col("text").isNotNull(),
            F.concat_ws(
                " ", F.slice(w, 1, F.greatest(F.size(w) - 5, F.lit(0)))
            ),
        ).alias("text"),
    )
    # width from spark.sql.shuffle.partitions, NOT defaultParallelism:
    # the session default keeps them equal (32 locally), but a
    # data-proportional run (the 1000x decade smoke sets 256) must be
    # able to shrink the per-task row count — at 6M mutated docs the
    # 32-wide pin put 190k docs' shingle/md5 work in ONE task (~50 min
    # per task wave, G1 humongous-allocation storms), which is a
    # local-harness artifact a real cluster never sees precisely
    # because its partition count scales with the data.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return orig.unionAll(mut).repartition(n_part)


_MUT_CTE = """
WITH corpus AS (
  SELECT doc_id * 2 AS doc_id, source, text FROM documents
  UNION ALL
  -- <=5-word docs mutate to '' EXPLICITLY: DuckDB list slicing reads
  -- a NEGATIVE end index from the END of the list, so the unguarded
  -- l[1:len-5] KEPT words for 1-4-word docs (a 4-word doc's
  -- "mutation" was the original minus nothing) while Spark's
  -- slice(w, 1, greatest(len-5, 0)) gives '' — the round-9 deep
  -- property hunt caught the divergence (duck-only est=1.0 LSH
  -- pairs).  coalesce: array_to_string of an empty slice is NULL in
  -- DuckDB but Spark's concat_ws gives ''; NULL text stays NULL
  SELECT doc_id * 2 + 1 AS doc_id, source,
         CASE WHEN text IS NULL THEN NULL
              WHEN len(string_split(text, ' ')) <= 5 THEN ''
              ELSE coalesce(array_to_string((string_split(text, ' '))[1:len(string_split(text, ' ')) - 5], ' '), '')
         END AS text
  FROM documents
)
"""

_SHINGLES_DUCK = (
    "list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1), "
    "i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))"
)


# ---------------------------------------------------------------------------
# text analysis

_SW = {k: ", ".join(f"'{w}'" for w in v) for k, v in LANG_STOPWORDS.items()}
_HITS = {
    lang: f"len(list_filter(string_split(text, ' '), w -> list_contains([{_SW[lang]}], w)))"
    for lang in LANG_STOPWORDS
}
_LANG_CASE = "CASE WHEN __m = 0 THEN 'unknown' " + " ".join(
    f"WHEN __h_{lang} = __m THEN '{lang}'" for lang in sorted(LANG_STOPWORDS)
) + " ELSE 'unknown' END"


@_register(
    "doc_text_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS token_count_ws,
             len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token_count_bpe,
             length(text) AS n_chars,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             {_HITS['en']} AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_unique,
             {" , ".join(f"{_HITS[lang]} AS __h_{lang}" for lang in sorted(LANG_STOPWORDS))}
      FROM documents
    ), feat AS (
      SELECT *,
             token_count_ws AS n_words,
             greatest({", ".join("__h_" + lang for lang in sorted(LANG_STOPWORDS))}) AS __m
      FROM base
    )
    SELECT doc_id, token_count_ws, token_count_bpe, n_chars,
           ROUND(n_punct / nullif(n_chars, 0), 6) AS punct_ratio,
           ROUND(n_stop / nullif(n_words, 0), 6) AS stopword_ratio,
           ROUND((n_chars - (n_words - 1)) / nullif(n_words, 0), 6)
             AS mean_word_len,
           ROUND(n_unique / nullif(n_words, 0), 6) AS unique_ratio,
           ROUND(0.4 * least(n_words / 100.0, 1.0)
                 + 0.3 * (n_stop / nullif(n_words, 0))
                 + 0.3 * (n_unique / nullif(n_words, 0)), 6)
             AS quality_score,
           {_LANG_CASE} AS lang_guess,
           md5(text) AS fp_md5,
           list_min(list_transform({_SHINGLES_DUCK}, s -> md5(s))) AS fp_min_shingle
    FROM feat
    """,
    headline=True,
    tags=("llmdata", "text"),
    doc="language-ID (stopword-hit argmax), quality scoring "
    "(length/punct/stopword/uniqueness ratios), whitespace + BPE-ish "
    "token counting, md5 + min-shingle fingerprints — one codegen'd "
    "projection pass, no UDFs.",
)
def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    out = add_text_stats(d)
    return out.select(
        "doc_id",
        "token_count_ws",
        "token_count_bpe",
        "n_chars",
        _r6(F.col("punct_ratio")).alias("punct_ratio"),
        _r6(F.col("stopword_ratio")).alias("stopword_ratio"),
        _r6(F.col("mean_word_len")).alias("mean_word_len"),
        _r6(F.col("unique_ratio")).alias("unique_ratio"),
        _r6(F.col("quality_score")).alias("quality_score"),
        "lang_guess",
        "fp_md5",
        "fp_min_shingle",
    )


# ---------------------------------------------------------------------------
# dedup family


@_register(
    "doc_dedup_exact",
    oracle="""
    WITH doubled AS (
      SELECT * FROM documents UNION ALL SELECT * FROM documents
    )
    SELECT md5(text) AS text_md5,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM doubled
    GROUP BY md5(text)
    """,
    tags=("llmdata", "dedup"),
    doc="exact dedup: hash-groupBy on md5(text) over a deliberately "
    "doubled corpus — one shuffle on a 32-byte key, keeper = min id.",
)
def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d.unionAll(d))


def _sig_sql(k: int) -> str:
    mins = ", ".join(
        f"list_min(list_transform({_SHINGLES_DUCK}, s -> md5(concat('{j}|', s))))"
        for j in range(k)
    )
    return f"[{mins}]"


@_register(
    "doc_minhash_lsh",
    oracle=_MUT_CTE
    + f"""
    , sig AS (
      SELECT doc_id, {_sig_sql(16)} AS sig FROM corpus
    ), banded AS (
      SELECT doc_id, sig, b.band_idx,
             md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], '|')) AS band_hash
      FROM sig, (SELECT unnest(range(0, 8)) AS band_idx) b
    ), ok_buckets AS (
      -- boilerplate guard, mirrored from the Spark side: buckets with
      -- more than 64 members are dropped before the self-join
      SELECT band_idx, band_hash FROM banded
      GROUP BY band_idx, band_hash HAVING COUNT(*) <= 64
    ), pairs AS (
      SELECT DISTINCT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2,
             l.sig AS sig1, r.sig AS sig2
      FROM banded l JOIN banded r
        ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
      JOIN ok_buckets ob
        ON ob.band_idx = l.band_idx AND ob.band_hash = l.band_hash
    )
    SELECT doc_id_1, doc_id_2,
           ROUND(list_sum(list_transform(range(1, 17),
                 i -> CASE WHEN sig1[i] = sig2[i] THEN 1 ELSE 0 END)) / 16.0, 6) AS est_jaccard
    FROM pairs
    WHERE list_sum(list_transform(range(1, 17),
          i -> CASE WHEN sig1[i] = sig2[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.5
    """,
    headline=True,
    tags=("llmdata", "dedup", "join"),
    doc="MinHash-LSH near-dup pairs: 16-permutation signature (min "
    "md5 over 3-gram shingles), 8 bands x 2 rows, self-join on band "
    "buckets (sub-quadratic), estimated Jaccard >= 0.5. Finds the "
    "planted near-duplicates (residue ids 2i vs 2i+1). Band buckets larger "
    "than 64 members are dropped on BOTH sides (boilerplate guard, "
    "llmdata/dedup.py:minhash_lsh_pairs) so a shared crawl header "
    "can't turn the self-join quadratic on the hottest key; the cap "
    "is exercised by a planted hot bucket in tests/test_llmdata.py "
    "and tools/scale_smoke.py.",
)
def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus, k=16, bands=8, threshold=0.5)
    return pairs.select(
        "doc_id_1", "doc_id_2", _r6(F.col("est_jaccard")).alias("est_jaccard")
    )


_SIMHASH_VOTES_DUCK = ", ".join(
    f"SUM(CASE WHEN floor(h / {float(2**b)!r}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(32)
)
_SIMHASH_ASSEMBLE = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)" for b in range(32)
)


@_register(
    "doc_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {word32_sql('tok')} AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    ), votes AS (
      SELECT doc_id, {_SIMHASH_VOTES_DUCK}
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {_SIMHASH_ASSEMBLE} AS simhash FROM votes
    """,
    tags=("llmdata", "dedup"),
    doc="32-bit SimHash per document (Charikar sign-vote over md5 "
    "token hashes): explode -> hash once per token -> 32 conditional "
    "sums in one linear aggregation. Equal hashes bucket near-dups.",
)
def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return simhash32(d)


@_register(
    "doc_ngram_jaccard",
    oracle=_MUT_CTE
    + f"""
    , sh AS (
      SELECT doc_id, source, {_SHINGLES_DUCK} AS sh FROM corpus
    ), tok AS (
      SELECT doc_id, source, unnest(sh) AS g FROM sh
    ), sizes AS (
      SELECT doc_id, len(sh) AS n FROM sh
    ), inter AS (
      -- inverted index: only co-shingle pairs materialize (identical
      -- output for threshold > 0; the old within-group row join was
      -- quadratic in group size — 62M list intersections at sf1)
      SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
             COUNT(*) AS i
      FROM tok a JOIN tok b
        ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_id_1, i.doc_id_2,
           ROUND(CAST(i.i AS DOUBLE) / (s1.n + s2.n - i.i), 6) AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.doc_id_1 = s1.doc_id
    JOIN sizes s2 ON i.doc_id_2 = s2.doc_id
    WHERE CAST(i.i AS DOUBLE) / (s1.n + s2.n - i.i) >= 0.2
    """,
    tags=("llmdata", "dedup", "join"),
    doc="exact word-3-gram Jaccard >= 0.2 within candidate groups "
    "(source; at scale: an LSH bucket) via a per-group inverted "
    "index — the verify stage of the dedup funnel. Rebuilt round 8: "
    "the within-group row-level self-join was quadratic in group "
    "size (62M array intersections at the sf1 sweep's 2.5k-doc "
    "source groups); the index form costs sum(df^2) per (group, "
    "shingle) and emits the identical pair set for any positive "
    "threshold.",
)
def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, group_col="source", threshold=0.2)
    return pairs.select(
        "doc_id_1", "doc_id_2", _r6(F.col("jaccard")).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# similarity search

_DOT_DUCK = (
    "list_reduce(list_transform(range(1, 65), i -> qv[i] * cv[i]), (x, y) -> x + y)"
)
_NORM_DUCK = (
    "sqrt(nullif(list_reduce(list_transform(range(1, 65), i -> {v}[i] * {v}[i]), (x, y) -> x + y), 0))"
)


@_register(
    "embedding_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, e AS cv FROM v
    ), scored AS (
      SELECT query_id, neighbor_id,
             {_DOT_DUCK} / ({_NORM_DUCK.format(v='qv')} * {_NORM_DUCK.format(v='cv')}) AS cosine
      FROM q, c WHERE query_id != neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 5
    """,
    headline=True,
    tags=("llmdata", "similarity"),
    doc="exact brute-force cosine top-5 per query vector (the ANN "
    "correctness baseline): broadcast query side, JVM-side sequential "
    "fold over array<double> (bit-identical to DuckDB list_reduce), "
    "per-query top-k via window.",
)
def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)
    return out.select(
        "query_id", "rank", "neighbor_id", _r6(F.col("cosine")).alias("cosine")
    )


_N_TABLES, _N_PLANES = 8, 4


def _plane_duck(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"


def _bucket_duck(table: int) -> str:
    planes = pseudo_planes(_N_PLANES, 64, table=table)
    return " + ".join(
        f"(CASE WHEN list_reduce(list_transform(range(1, 65), i -> e[i] * ({_plane_duck(p)})[i]), (x, y) -> x + y) > 0 THEN {2**j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )


_BUCKETS_DUCK = "[" + ", ".join(_bucket_duck(t) for t in range(_N_TABLES)) + "]"


@_register(
    "embedding_srp_ann",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {_BUCKETS_DUCK} AS buckets
      FROM embeddings
    ), exp AS (
      SELECT vec_id, e, t.i AS tidx, buckets[t.i + 1] AS bucket
      FROM v, range({_N_TABLES}) t(i)
    ), q AS (
      SELECT vec_id AS query_id, e AS qv, tidx, bucket FROM exp WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, e AS cv, tidx, bucket FROM exp
    ), cand AS (
      SELECT DISTINCT query_id, neighbor_id, qv, cv
      FROM q JOIN c USING (tidx, bucket) WHERE query_id != neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id,
             {_DOT_DUCK} / ({_NORM_DUCK.format(v='qv')} * {_NORM_DUCK.format(v='cv')}) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               {_DOT_DUCK} / ({_NORM_DUCK.format(v='qv')} * {_NORM_DUCK.format(v='cv')}) DESC,
               neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """,
    tags=("llmdata", "similarity"),
    doc="multi-table SRP-LSH ANN (the scale path): 8 independent "
    "4-plane families -> per-(table, bucket) equi-join, pair-distinct, "
    "top-3 by cosine. Multi-table buys recall (1-(1-p^4)^8); recall "
    "vs brute force asserted in tests/test_llmdata.py.",
)
def q_embedding_srp_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    out = srp_lsh_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        k=3,
        n_planes=_N_PLANES,
        n_tables=_N_TABLES,
        dim=64,
    )
    return out.select(
        "query_id", "rank", "neighbor_id", _r6(F.col("cosine")).alias("cosine")
    )


# ---------------------------------------------------------------------------
# multimodal plumbing


@_register(
    "media_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 21 END
             + octet_length(encode(coalesce(text, ''))) AS byte_len,
           CASE WHEN doc_id % 2 = 0 THEN 'PNG' ELSE 'JPEG' END AS format,
           CAST(doc_id % 512 + 16 AS INTEGER) AS width,
           CAST((doc_id * 7) % 512 + 16 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(1 AS INTEGER) AS n_frames,
           true AS decode_ok
    FROM documents
    """,
    tags=("llmdata", "multimodal"),
    doc="multimodal metadata: opaque binary payload column -> "
    "Arrow-batched mapInPandas kernel running a REAL dependency-free "
    "header decode (PNG IHDR / JPEG SOF0 / GIF — "
    "llmdata/multimodal.py:decode_image). The payloads are genuine "
    "PNG/JPEG containers synthesized JVM-side with dimensions that are "
    "a function of doc_id, so the oracle recomputes what the parser "
    "must read back out of the bytes. Malformed payloads dead-letter "
    "to decode_ok=false rows (kernel test).",
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition before the Python kernel: the single-file corpus
    # would otherwise pin all Arrow batches to 2 cores
    d = attach_image_payload(
        _t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    return extract_media_metadata(d)


# LSH candidate pairs as a reusable oracle fragment (the same banding
# the doc_minhash_lsh oracle replays), for queries that need the
# candidate set as an input rather than as the answer.
_LSH_CAND_CTES = f"""
    , sig AS (
      SELECT doc_id, {_sig_sql(16)} AS sig FROM corpus
    ), banded AS (
      SELECT doc_id, sig, b.band_idx,
             md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], '|')) AS band_hash
      FROM sig, (SELECT unnest(range(0, 8)) AS band_idx) b
    ), ok_buckets AS (
      SELECT band_idx, band_hash FROM banded
      GROUP BY band_idx, band_hash HAVING COUNT(*) <= 64
    ), cand AS (
      SELECT DISTINCT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2
      FROM banded l JOIN banded r
        ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
      JOIN ok_buckets ob
        ON ob.band_idx = l.band_idx AND ob.band_hash = l.band_hash
      WHERE list_sum(list_transform(range(1, 17),
            i -> CASE WHEN l.sig[i] = r.sig[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.5
    )
"""


@_register(
    "minhash_lsh_recall_eval",
    oracle=_MUT_CTE
    + f"""
    , tok0 AS (
      SELECT doc_id, unnest(sh) AS s FROM (
        SELECT doc_id, {_SHINGLES_DUCK} AS sh FROM corpus
      ) WHERE len(sh) > 0
    ), rare AS (
      -- boilerplate guard mirrored from the Spark side: shingles in
      -- more than 64 docs leave the vocabulary (a crawl banner's
      -- shingles cost df^2 pairs each on the hottest index keys)
      SELECT s FROM tok0 GROUP BY s HAVING COUNT(*) <= 64
    ), tok AS (
      SELECT tok0.doc_id, tok0.s FROM tok0 JOIN rare USING (s)
    ), shn AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM tok GROUP BY doc_id
    ), inter AS (
      SELECT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2,
             COUNT(*) AS n_inter
      FROM tok l JOIN tok r ON l.s = r.s AND l.doc_id < r.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT i.doc_id_1, i.doc_id_2,
             CAST(i.n_inter AS DOUBLE)
               / (a.n_sh + b.n_sh - i.n_inter) AS jac
      FROM inter i JOIN shn a ON a.doc_id = i.doc_id_1
                   JOIN shn b ON b.doc_id = i.doc_id_2
    ){_LSH_CAND_CTES}
    SELECT CAST(least(floor(t.jac * 10), 9) AS INT) AS jaccard_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN c.doc_id_1 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_caught,
           ROUND(SUM(CASE WHEN c.doc_id_1 IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS catch_rate
    FROM truth t
    LEFT JOIN cand c
      ON c.doc_id_1 = t.doc_id_1 AND c.doc_id_2 = t.doc_id_2
    GROUP BY 1 ORDER BY 1
    """,
    tags=("llmdata", "dedup", "join", "evaluation"),
    doc="Measures the LSH S-curve instead of assuming it: exact "
    "shingle-Jaccard ground truth for every co-shingle pair "
    "(inverted-index join — a J=0 pair never materializes; "
    "llmdata/dedup.py:exact_jaccard_pairs_inverted) LEFT JOIN the "
    "minhash_lsh_pairs candidate set, rolled up into per-Jaccard-"
    "decile catch rates. High deciles must approach 1.0 (recall on "
    "true near-dups), low deciles near 0 (LSH not wasting verify "
    "budget) — the recall/cost trade every banded-LSH deployment "
    "tunes blind unless it runs exactly this query on a sample. At "
    "100 TB the truth side runs over a sampled subset and caps "
    "shingle document-frequency, mirroring the band-bucket cap.",
)
def q_minhash_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin ONE shingle frame once per invocation: the exact-Jaccard
    # truth and the LSH candidate stage both consume it, so the
    # mutation chain AND the shingle transform run once instead of
    # once per stage (optimization r11 — this subsumes the earlier
    # corpus-level pin: the only non-shingle column either stage needs
    # is doc_id, which the shingle frame carries)
    corpus = _mutated_corpus(spark, sf_dir)
    sh = corpus.select(
        "doc_id", shingles("text").alias("sh")
    ).localCheckpoint(eager=False)
    truth = exact_jaccard_pairs_inverted_from_shingles(sh, sh_col="sh")
    cand = minhash_lsh_pairs_from_shingles(
        sh, sh_col="sh", k=16, bands=8, threshold=0.5
    ).select("doc_id_1", "doc_id_2", F.lit(1).alias("__hit"))
    j = truth.join(cand, ["doc_id_1", "doc_id_2"], "left")
    bucket = F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int")
    out = (
        j.groupBy(bucket.alias("jaccard_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias(
                "n_caught"
            ),
        )
        .select(
            "jaccard_bucket",
            "n_pairs",
            "n_caught",
            _r6(F.col("n_caught") * 1.0 / F.col("n_pairs")).alias("catch_rate"),
        )
        .orderBy("jaccard_bucket")
    )
    return out


# Shared exact-vs-SRP CTE block: exact_top = brute-force cosine top-10
# per query, approx_top = the SRP-LSH index's top-10 over its candidate
# set. ann_recall_eval reports per-query recall; the certificate query
# aggregates the same block into one driver-hashed boolean gate.
_ANN_EVAL_CTES = f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {_BUCKETS_DUCK} AS buckets
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, e AS qv, buckets AS qb FROM v
      WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, e AS cv, buckets AS cb FROM v
    ), exact_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               {_DOT_DUCK} / ({_NORM_DUCK.format(v='qv')} * {_NORM_DUCK.format(v='cv')}) DESC,
               neighbor_id) AS rank
      FROM q, c WHERE query_id != neighbor_id
    ), exact_top AS (
      SELECT query_id, neighbor_id FROM exact_ranked WHERE rank <= 10
    ), cand AS (
      SELECT DISTINCT query_id, neighbor_id, qv, cv
      FROM q JOIN c ON EXISTS (
        SELECT 1 FROM range({_N_TABLES}) t(i)
        WHERE qb[t.i + 1] = cb[t.i + 1]
      ) WHERE query_id != neighbor_id
    ), approx_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               {_DOT_DUCK} / ({_NORM_DUCK.format(v='qv')} * {_NORM_DUCK.format(v='cv')}) DESC,
               neighbor_id) AS rank
      FROM cand
    ), approx_top AS (
      SELECT query_id, neighbor_id FROM approx_ranked WHERE rank <= 10
    )"""


@_register(
    "ann_recall_eval",
    oracle=_ANN_EVAL_CTES
    + """
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS recall_at_10
    FROM exact_top e
    LEFT JOIN approx_top a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
    tags=("llmdata", "similarity", "evaluation"),
    doc="Measured recall@10 of the multi-table SRP-LSH ANN against "
    "the exact brute-force cosine baseline, per query vector — the "
    "ANN counterpart of minhash_lsh_recall_eval: an index is only as "
    "good as the recall you MEASURED at the bucket/table budget you "
    "deploy. Both sides reuse the registry's own operators "
    "(cosine_topk, srp_lsh_topk) so the evaluation exercises exactly "
    "the production code path; at 100 TB the same query runs over a "
    "sampled query set while the corpus side stays full-scale "
    "(bucket joins, no cross join on the approx path).",
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(q, emb, k=10).select("query_id", "neighbor_id")
    approx = srp_lsh_topk(
        q, emb, k=10, n_planes=_N_PLANES, n_tables=_N_TABLES, dim=64
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    j = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            _r6(F.col("n_hit") * 1.0 / F.col("n_exact")).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


@_register(
    "srp_ann_recall_certificate",
    oracle=_ANN_EVAL_CTES
    + """
    SELECT CAST(COUNT(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS recall_at_10,
           -- COALESCE: zero queries -> gate FAILS (no evidence is
           -- not a pass), and both engines agree instead of emitting
           -- a NULL boolean (empty-corpus sweep)
           COALESCE(2 * SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             >= COUNT(*), FALSE) AS meets_gate
    FROM exact_top e
    LEFT JOIN approx_top a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    """,
    tags=("llmdata", "similarity", "evaluation"),
    doc="the SRP-ANN deployment gate as a driver-hashed certificate: "
    "the recall>=0.5 floor tests/test_llmdata.py asserts (expected "
    "~0.75 at 8 tables x 4 planes) folded into ONE boolean row over "
    "the same exact-vs-approx machinery as ann_recall_eval. The gate "
    "compare is pure integer arithmetic (2*n_hit >= n_exact), so no "
    "float-boundary flip can shear the boolean between engines; at "
    "100 TB this runs on a sampled query set as the recall regression "
    "check before an index-parameter change ships.",
)
def q_srp_ann_recall_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(q, emb, k=10).select("query_id", "neighbor_id")
    approx = srp_lsh_topk(
        q, emb, k=10, n_planes=_N_PLANES, n_tables=_N_TABLES, dim=64
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    j = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return j.agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
        .cast("bigint")
        .alias("n_hit"),
    ).select(
        "n_queries",
        "n_exact",
        "n_hit",
        _r6(F.col("n_hit") * 1.0 / F.col("n_exact")).alias("recall_at_10"),
        F.coalesce(
            2 * F.col("n_hit") >= F.col("n_exact"), F.lit(False)
        ).alias("meets_gate"),
    )
