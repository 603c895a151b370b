"""The composed dedup funnel and embedding-cosine near-dup pairs —
the remaining two training-data dedup entries (task list: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.localrel import values_df
from stockpulse_spark.llmdata.dedup import minhash_lsh_pairs
from stockpulse_spark.llmdata.similarity import _as_double, dot, norm
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_llmdata import (
    _MUT_CTE,
    _SHINGLES_DUCK,
    _mutated_corpus,
    _sig_sql,
)


@_register(
    "doc_dedup_funnel",
    oracle=_MUT_CTE
    + f"""
    , sig AS (
      SELECT doc_id, {_sig_sql(16)} AS sig, {_SHINGLES_DUCK} AS sh FROM corpus
    ), banded AS (
      SELECT doc_id,
             md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], '|')) AS band_hash,
             b.band_idx
      FROM sig, (SELECT unnest(range(0, 8)) AS band_idx) b
    ), ok_buckets AS (
      -- boilerplate bucket cap, mirrored from minhash_lsh_pairs
      SELECT band_idx, band_hash FROM banded
      GROUP BY band_idx, band_hash HAVING COUNT(*) <= 64
    ), cand AS (
      SELECT DISTINCT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2
      FROM banded l JOIN banded r
        ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
      JOIN ok_buckets ob
        ON ob.band_idx = l.band_idx AND ob.band_hash = l.band_hash
    )
    SELECT c.doc_id_1, c.doc_id_2,
           ROUND(CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)
                 / nullif(len(list_distinct(list_concat(s1.sh, s2.sh))), 0), 6) AS jaccard
    FROM cand c
    JOIN sig s1 ON c.doc_id_1 = s1.doc_id
    JOIN sig s2 ON c.doc_id_2 = s2.doc_id
    WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)
          / nullif(len(list_distinct(list_concat(s1.sh, s2.sh))), 0) >= 0.6
    """,
    tags=("llmdata", "dedup", "pipeline"),
    doc="the full near-dup FUNNEL in one plan: MinHash-LSH generates "
    "sub-quadratic candidates, exact shingle-Jaccard verifies them "
    "(>= 0.6) — cheap-filter-then-exact-verify, the shape every 100 TB "
    "dedup pipeline runs. Candidates come from the LSH band join, so "
    "the expensive exact Jaccard touches ~|near-dups| pairs, not n².",
)
def q_doc_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.dedup import (
        minhash_lsh_pairs_from_shingles,
        shingles,
    )

    corpus = _mutated_corpus(spark, sf_dir)
    # one shingle computation per invocation, shared by the candidate
    # stage (signatures) and the verify stage (exact Jaccard): pin the
    # shingle frame with a lazy per-invocation localCheckpoint
    # (optimization r11 — the corpus mutation + shingle transform
    # previously ran twice, once inside minhash_lsh_pairs and once for
    # the verify rejoin)
    sh = corpus.select(
        "doc_id", shingles("text").alias("sh")
    ).localCheckpoint(eager=False)
    # stage 1: sub-quadratic candidates (ids only)
    cand = minhash_lsh_pairs_from_shingles(
        sh, sh_col="sh", k=16, bands=8, threshold=0.0
    ).select("doc_id_1", "doc_id_2")
    # stage 2: exact Jaccard computed ONLY for candidate pairs — the
    # expensive set intersection touches ~|near-dups| pairs, never n²
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2"))
    enriched = cand.join(s1, "doc_id_1").join(s2, "doc_id_2")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    # nullif: shingle-less docs (short/empty text) have an UNDEFINED
    # Jaccard -> NULL -> dropped by the threshold (oracle mirrors)
    union = F.size(F.array_union("sh1", "sh2"))
    jac = inter.cast("double") / F.nullif(union, F.lit(0))
    return (
        enriched.select("doc_id_1", "doc_id_2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
        .select("doc_id_1", "doc_id_2", _r6(F.col("jaccard")).alias("jaccard"))
    )


from stockpulse_spark.llmdata.hashing import word32_sql  # noqa: E402
from stockpulse_spark.plans.registry_llmdata import (  # noqa: E402
    _SIMHASH_ASSEMBLE,
    _SIMHASH_VOTES_DUCK,
    _plane_duck,
)

# Cardinality-ADAPTIVE SRP buckets for the semantic-dedup oracle.
# The Spark side picks n_planes = clamp(ceil(log2(n/64)), 4, 12) from
# the parquet footer count so per-bucket pair work stays ~constant as
# the corpus grows; the oracle must bucket IDENTICALLY at every scale
# or the candidate sets (and so the components) diverge — round 5's
# sf0.1 sweep caught exactly that (static 4-plane oracle vs adaptive
# 5-plane Spark side). Plane j >= 4 participates iff n > 64 * 2**j —
# the exact integer form of ceil(log2(n/64)) > j — via a CASE on a
# COUNT(*) scalar, so both engines derive the plane count from the
# same arithmetic with no float boundary.
_SEM_MAX_PLANES = 12


def _bucket_duck_adaptive(table: int) -> str:
    from stockpulse_spark.llmdata.similarity import pseudo_planes

    planes = pseudo_planes(_SEM_MAX_PLANES, 64, table=table)
    bits = []
    for j, pl in enumerate(planes):
        bit = (
            "(CASE WHEN list_reduce(list_transform(range(1, 65), "
            f"i -> e[i] * ({_plane_duck(pl)})[i]), (x, y) -> x + y) > 0 "
            f"THEN {2**j} ELSE 0 END)"
        )
        if j >= 4:
            bit = f"(CASE WHEN nn > {64 * 2**j} THEN {bit} ELSE 0 END)"
        bits.append(bit)
    return " + ".join(bits)


_SEM_BUCKETS_DUCK = (
    "[" + ", ".join(_bucket_duck_adaptive(t) for t in range(8)) + "]"
)


@_register(
    "doc_simhash_hamming_pairs",
    oracle=_MUT_CTE
    + f"""
    , toks AS (
      SELECT doc_id, {word32_sql('tok')} AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus)
    ), votes AS (
      SELECT doc_id, {_SIMHASH_VOTES_DUCK} FROM toks GROUP BY doc_id
    ), sim AS (
      SELECT doc_id, {_SIMHASH_ASSEMBLE} AS simhash FROM votes
    ), halves AS (
      SELECT doc_id, simhash,
             CAST(simhash // 65536 AS BIGINT) AS hi,
             CAST(simhash % 65536 AS BIGINT) AS lo
      FROM sim
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
             a.simhash AS s1, b.simhash AS s2
      FROM halves a JOIN halves b
        ON (a.hi = b.hi OR a.lo = b.lo) AND a.doc_id < b.doc_id
    )
    SELECT doc_id_1, doc_id_2,
           CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(s1, s2)) <= 6
    """,
    tags=("llmdata", "dedup", "join"),
    doc="SimHash Hamming-distance near-dup join: pigeonhole on 16-bit "
    "halves (hamming <= 6 over 32 bits means some half differs by "
    "<= 3; the half-equality join is the sub-quadratic candidate "
    "filter for the common all-but-few-bits case), then exact "
    "popcount(xor) verify. Completes the simhash dedup tier.",
)
def q_doc_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.dedup import simhash32

    corpus = _mutated_corpus(spark, sf_dir)
    # pin once per invocation: the two pigeonhole half-joins read this
    # frame on FOUR plan branches (each join's two sides), and without
    # the pin each branch re-ran simhash32's token explode + 32-vote
    # aggregation over the mutated corpus (optimization r11)
    sim = simhash32(corpus).select(
        "doc_id",
        "simhash",
        F.expr("CAST(simhash div 65536 AS BIGINT)").alias("hi"),
        (F.col("simhash") % 65536).alias("lo"),
    ).localCheckpoint(eager=False)
    # an OR join condition would plan as BroadcastNestedLoopJoin (n²);
    # pigeonhole as TWO hash equi-joins (one per half) unioned+distinct
    def half_join(col: str):
        a = sim.select(
            F.col("doc_id").alias("doc_id_1"),
            F.col("simhash").alias("s1"),
            F.col(col).alias("__k"),
        )
        b = sim.select(
            F.col("doc_id").alias("doc_id_2"),
            F.col("simhash").alias("s2"),
            F.col(col).alias("__k"),
        )
        return (
            a.join(b, "__k")
            .filter(F.col("doc_id_1") < F.col("doc_id_2"))
            .select("doc_id_1", "doc_id_2", "s1", "s2")
        )

    pairs = half_join("hi").unionAll(half_join("lo")).distinct()
    hamming = F.bit_count(F.expr("s1 ^ s2")).cast("int")
    return (
        pairs.select("doc_id_1", "doc_id_2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 6)
    )


_DOT64 = (
    "list_reduce(list_transform(range(1, 65), i -> v1[i] * v2[i]), (x, y) -> x + y)"
)
_N64 = "sqrt(nullif(list_reduce(list_transform(range(1, 65), i -> {v}[i] * {v}[i]), (x, y) -> x + y), 0))"


@_register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
           ROUND({_DOT64.replace('v1', 'a.e').replace('v2', 'b.e')}
                 / ({_N64.format(v='a.e')} * {_N64.format(v='b.e')}), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_DOT64.replace('v1', 'a.e').replace('v2', 'b.e')}
          / ({_N64.format(v='a.e')} * {_N64.format(v='b.e')}) >= 0.5
    """,
    tags=("llmdata", "dedup", "similarity"),
    doc="embedding-cosine near-dup pairs (cosine >= 0.5) — the exact "
    "baseline; the SRP-LSH bucketing (embedding_srp_ann) is the "
    "sub-quadratic candidate generator for the same predicate at "
    "scale. Self-join keyed id<id halves the pair space; the dot fold "
    "is sequential in both engines.",
)
def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        _t(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("vec_id"), _as_double(F.col("embedding")).alias("e"))
        .withColumn("n", norm(F.col("e")))
    )
    a = emb.select(
        F.col("vec_id").alias("vec_id_1"), F.col("e").alias("e1"), F.col("n").alias("n1")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_id_2"), F.col("e").alias("e2"), F.col("n").alias("n2")
    )
    pairs = a.join(b, a.vec_id_1 < b.vec_id_2)
    cos = dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        pairs.select("vec_id_1", "vec_id_2", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.5)
        .select("vec_id_1", "vec_id_2", _r6(F.col("cosine")).alias("cosine"))
    )


@_register(
    "doc_edit_distance_pairs",
    oracle=_MUT_CTE
    + """
    , keyed AS (
      SELECT doc_id, text,
             md5(array_to_string((string_split(text, ' '))[1:10], ' ')) AS pfx
      FROM corpus
    ), cand AS (
      SELECT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2,
             l.text AS t1, r.text AS t2
      FROM keyed l JOIN keyed r ON l.pfx = r.pfx AND l.doc_id < r.doc_id
    )
    SELECT doc_id_1, doc_id_2,
           levenshtein(t1, t2) AS edit_dist,
           -- nullif: two empty texts have max length 0; their edit
           -- similarity is UNDEFINED -> NULL -> dropped on both engines
           ROUND(1.0 - levenshtein(t1, t2)
                 / CAST(nullif(greatest(length(t1), length(t2)), 0)
                        AS DOUBLE), 6)
             AS edit_sim
    FROM cand
    WHERE 1.0 - levenshtein(t1, t2)
          / CAST(nullif(greatest(length(t1), length(t2)), 0) AS DOUBLE)
          >= 0.5
    """,
    tags=("llmdata", "dedup"),
    doc="character-level edit-distance verification — the dedup-family "
    "member that catches typo-level mutations token hashing misses. "
    "Candidates come from cheap prefix-hash blocking (never all "
    "pairs); levenshtein runs only within blocks and pairs keep "
    "edit_sim = 1 - dist/max_len ≥ 0.5. Both engines implement "
    "classic Wagner-Fischer so the integer distances agree exactly. "
    "At 100 TB the block is an LSH bucket and the O(len²) distance is "
    "bounded by a length cap before the verify.",
)
def q_doc_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(spark, sf_dir)
    pfx = F.md5(
        F.encode(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 10)), "utf-8")
    )
    # pin once per invocation: both sides of the blocking self-join
    # read this frame, so the corpus mutation + prefix hash previously
    # ran twice (optimization r11)
    keyed = corpus.select(
        "doc_id", "text", pfx.alias("pfx")
    ).localCheckpoint(eager=False)
    l = keyed.select(
        F.col("doc_id").alias("doc_id_1"), F.col("text").alias("t1"), "pfx"
    )
    r = keyed.select(
        F.col("doc_id").alias("doc_id_2"), F.col("text").alias("t2"), "pfx"
    )
    cand = l.join(r, "pfx").filter(F.col("doc_id_1") < F.col("doc_id_2"))
    dist = F.levenshtein("t1", "t2")
    sim = 1.0 - dist / F.nullif(
        F.greatest(F.length("t1"), F.length("t2")).cast("double"), F.lit(0.0)
    )
    scored = cand.select(
        "doc_id_1",
        "doc_id_2",
        dist.alias("edit_dist"),
        sim.alias("__sim"),
    )
    return scored.filter(F.col("__sim") >= 0.5).select(
        "doc_id_1", "doc_id_2", "edit_dist", _r6(F.col("__sim")).alias("edit_sim")
    )


_COS_AB = (
    _DOT64.replace("v1", "a.e").replace("v2", "b.e")
    + " / (" + _N64.format(v="a.e") + " * " + _N64.format(v="b.e") + ")"
)


@_register(
    "semantic_dedup_keepers",
    oracle=f"""
    WITH RECURSIVE n AS (
      SELECT COUNT(*) AS nn FROM embeddings
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             {{buckets_duck}} AS buckets
      FROM embeddings, n
    ), exp AS (
      SELECT vec_id, e, t.i AS tidx, buckets[t.i + 1] AS bucket
      FROM v, range({{n_tables}}) t(i)
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2,
             a.e AS ae, b.e AS be
      FROM exp a JOIN exp b
        ON a.tidx = b.tidx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    ), pairs AS (
      SELECT id1, id2 FROM cand
      WHERE {_COS_AB.replace('a.e', 'ae').replace('b.e', 'be')} >= 0.5
    ), sym AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ), reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), comp AS (
      SELECT a AS vec_id, MIN(b) AS mn FROM reach GROUP BY a
    ), labeled AS (
      SELECT v.vec_id,
             LEAST(v.vec_id, COALESCE(c.mn, v.vec_id)) AS keeper_id
      FROM v LEFT JOIN comp c USING (vec_id)
    )
    SELECT vec_id, keeper_id,
           vec_id != keeper_id AS is_duplicate,
           COUNT(*) OVER (PARTITION BY keeper_id) AS cluster_size
    FROM labeled
    """.replace("{buckets_duck}", _SEM_BUCKETS_DUCK).replace("{n_tables}", "8"),
    tags=("llmdata", "dedup", "similarity", "iterative"),
    doc="SemDeDup-style semantic dedup at the SCALE shape: candidate "
    "pairs come from the multi-table SRP-LSH buckets (8 deterministic "
    "md5-derived plane families — the same bucketing embedding_srp_ann "
    "oracle-pins), exact cosine >= 0.5 verifies them, connected "
    "components elect one keeper per cluster with cluster sizes for "
    "pruning-rate accounting. Sub-quadratic by construction: the only "
    "pair work is within (table, bucket) groups. The first 10x scale "
    "smoke MEASURED the previous exact self-join variant at 132x "
    "(729 s) — this rewrite is the measure-don't-guess fix, with the "
    "oracle mirroring the bucketing so recall trade-offs are explicit "
    "and value-checked, never silent.",
)
def q_semantic_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql import Window

    from stockpulse_spark.llmdata.similarity import pseudo_planes
    from stockpulse_spark.operators.dedup import connected_components
    from stockpulse_spark.sources.tables import footer_row_count

    spark_emb = (
        _t(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("vec_id"), _as_double(F.col("embedding")).alias("e"))
    )
    # plane count adapts to corpus cardinality (parquet footer metadata,
    # zero jobs) targeting ~64-vector buckets, so per-bucket pair work
    # stays constant as the corpus grows: n=500 (the oracle gate scale)
    # -> 4 planes, matching the oracle's static bucket SQL; n=20k -> 9.
    n_rows = footer_row_count(sf_dir, "embeddings") or 500
    n_tables = 8
    n_planes = max(
        4, min(12, math.ceil(math.log2(max(n_rows, 64) / 64)))
    )  # cap mirrors the oracle's embedded plane families

    # one row per TABLE carrying its plane matrix (VALUES LocalRelation
    # — functions/localrel.py, optimization r11), bucket assembled
    # IN-ROW with interpreted higher-order functions (optimization r12):
    # the per-(table, plane) row form paid a (vec × table × plane)
    # broadcast nested-loop expansion plus a (vec_id, tidx) groupBy
    # exchange to reassemble the bits; the in-row fold computes the
    # same dot signs (identical zip_with/aggregate expression, same
    # fold order) and the same ascending-j integer sum with no
    # exchange and table-count rows per vector. Interpreted HOFs are
    # CodegenFallback, so the plane matrices do NOT hit the 10 s
    # whole-stage-codegen compile that inlining them as per-plane
    # literal expressions did (the r11 note on srp_lsh_topk).
    # Interleaved A/B at sf0.1: 4.44 -> 3.74 s, identical rows.
    tbl_rows = [
        (t, pseudo_planes(n_planes, 64, table=t)) for t in range(n_tables)
    ]
    tbl_df = values_df(spark, tbl_rows, ["tidx", "planes"])
    bucket = F.expr(
        "CAST(aggregate(transform(planes, (p, j) -> CASE WHEN "
        "aggregate(zip_with(e, p, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x) > 0 THEN shiftleft(1, j) ELSE 0 END), "
        "0, (a, b) -> a + b) AS INT)"
    )
    buckets = spark_emb.crossJoin(F.broadcast(tbl_df)).select(
        "vec_id", "tidx", bucket.alias("bucket")
    )
    # ids-only through the bucket join and the pair dedup (optimization
    # r11): the earlier shape carried both 64-double vectors through
    # the join and the dropDuplicates shuffle (~60x the bytes) and
    # recomputed norm() per CANDIDATE (2 interpreted 64-element folds
    # on each of ~460k pairs at sf0.1); norms are per-VECTOR values,
    # so compute them once per vector and rejoin vectors only for the
    # post-dedup cosine. Pair set and cosine bits are unchanged.
    a = buckets.select(F.col("vec_id").alias("id1"), "tidx", "bucket")
    b = buckets.select(F.col("vec_id").alias("id2"), "tidx", "bucket")
    cand = (
        a.join(b, ["tidx", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    vec = spark_emb.select("vec_id", "e", norm(F.col("e")).alias("n"))
    edges = (
        cand.join(
            vec.select(
                F.col("vec_id").alias("id1"),
                F.col("e").alias("e1"),
                F.col("n").alias("n1"),
            ),
            "id1",
        )
        .join(
            vec.select(
                F.col("vec_id").alias("id2"),
                F.col("e").alias("e2"),
                F.col("n").alias("n2"),
            ),
            "id2",
        )
        .filter(
            dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
            >= 0.5
        )
        .select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    )
    labels = connected_components(
        edges, vertices=spark_emb.select(F.col("vec_id")), id_col="vec_id"
    )
    return labels.select(
        "vec_id",
        F.col("label").alias("keeper_id"),
        (F.col("vec_id") != F.col("label")).alias("is_duplicate"),
        F.count(F.lit(1))
        .over(Window.partitionBy("label"))
        .alias("cluster_size"),
    )


@_register(
    "doc_dedup_pipeline_full",
    oracle=_MUT_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
    , sig AS (
      SELECT doc_id, {_sig_sql(16)} AS sig, {_SHINGLES_DUCK} AS sh FROM corpus
    ), banded AS (
      SELECT doc_id,
             md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], '|')) AS band_hash,
             b.band_idx
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
    ), verified AS (
      SELECT c.doc_id_1, c.doc_id_2
      FROM cand c
      JOIN sig s1 ON c.doc_id_1 = s1.doc_id
      JOIN sig s2 ON c.doc_id_2 = s2.doc_id
      WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)
            / nullif(len(list_distinct(list_concat(s1.sh, s2.sh))), 0) >= 0.6
    ), sym AS (
      SELECT doc_id_1 AS a, doc_id_2 AS b FROM verified
      UNION SELECT doc_id_2, doc_id_1 FROM verified
    ), reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), comp AS (
      SELECT a AS doc_id, MIN(b) AS mn FROM reach GROUP BY a
    )
    SELECT c.doc_id,
           LEAST(c.doc_id, COALESCE(m.mn, c.doc_id)) AS keeper_id,
           LEAST(c.doc_id, COALESCE(m.mn, c.doc_id)) != c.doc_id
             AS is_duplicate
    FROM corpus c LEFT JOIN comp m USING (doc_id)
    """,
    tags=("llmdata", "dedup", "pipeline", "iterative"),
    doc="the COMPLETE text dedup pipeline in one plan — what a corpus "
    "build actually runs end to end: MinHash-LSH candidates (bucket "
    "cap included) -> exact shingle-Jaccard verify (>= 0.6) -> "
    "connected components over the verified pairs -> one keeper per "
    "cluster. Composes minhash_lsh_pairs, the Jaccard verify stage, "
    "and operators/dedup.py:connected_components; every stage's "
    "oracle discipline carries through to the closed-form recursive-"
    "CTE closure. Each stage is the same sub-quadratic/bounded shape "
    "proven individually (PARITY + SCALE.md), so the composition "
    "inherits the 100 TB posture.",
)
def q_doc_dedup_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.dedup import (
        minhash_lsh_pairs_from_shingles,
        shingles,
    )
    from stockpulse_spark.operators.dedup import connected_components

    corpus = _mutated_corpus(spark, sf_dir)
    # pin the shingle frame once per invocation — candidates, verify
    # and the vertex set all read it (optimization r11; previously the
    # corpus mutation ran three times and the shingle transform twice)
    sh = corpus.select(
        "doc_id", shingles("text").alias("sh")
    ).localCheckpoint(eager=False)
    cand = minhash_lsh_pairs_from_shingles(
        sh, sh_col="sh", k=16, bands=8, threshold=0.0
    ).select("doc_id_1", "doc_id_2")
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("sh").alias("sh2"))
    jac = (
        F.size(F.array_intersect("sh1", "sh2")).cast("double")
        / F.nullif(F.size(F.array_union("sh1", "sh2")), F.lit(0))
    )
    verified = (
        cand.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .filter(jac >= 0.6)
        .select(F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst"))
    )
    # vertices from the pinned frame (row-for-row the corpus ids) —
    # avoids a third execution of the corpus mutation chain
    labels = connected_components(
        verified, vertices=sh.select("doc_id"), id_col="doc_id"
    )
    return labels.select(
        "doc_id",
        F.col("label").alias("keeper_id"),
        (F.col("doc_id") != F.col("label")).alias("is_duplicate"),
    )


# incremental batch construction for the gate below, shared by both
# engines: exact copies (doc_id % 5 == 0), 5-word-dropped mutations
# (% 5 == 1, the planted near-dups), word-REVERSED texts (% 5 == 2 —
# reversal destroys every shingle, so genuinely new content)
_BATCH_CTE = """
WITH RECURSIVE batch AS (
  SELECT doc_id + 1000000 AS batch_id, text FROM documents
  WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000,
         -- <=5-word guard: DuckDB reads a negative slice end from the
         -- END of the list (a 4-word doc would keep all its words),
         -- while the Spark side's greatest(len-5, 0) gives '' — same
         -- divergence class the round-9 deep hunt caught in _MUT_CTE
         CASE WHEN text IS NULL THEN NULL
              WHEN len(string_split(text, ' ')) <= 5 THEN ''
              ELSE coalesce(array_to_string(
                (string_split(text, ' '))[1:len(string_split(text, ' ')) - 5],
                ' '), '')
         END
  FROM documents WHERE doc_id % 5 = 1
  UNION ALL
  SELECT doc_id + 1000000,
         array_to_string(list_reverse(string_split(text, ' ')), ' ')
  FROM documents WHERE doc_id % 5 = 2
), corpus AS (
  SELECT doc_id, text FROM documents
)
"""


@_register(
    "incremental_dedup_gate",
    oracle=_BATCH_CTE
    + f"""
    , bsig AS (
      SELECT batch_id, md5(text) AS th, {_sig_sql(16)} AS sig FROM batch
    ), csig AS (
      SELECT doc_id, md5(text) AS th, {_sig_sql(16)} AS sig FROM corpus
    ), exact AS (
      SELECT DISTINCT b.batch_id FROM bsig b JOIN csig c ON b.th = c.th
    ), bband AS (
      SELECT batch_id, sig, t.band_idx,
             md5(array_to_string(sig[t.band_idx * 2 + 1 : t.band_idx * 2 + 2], '|')) AS band_hash
      FROM bsig, (SELECT unnest(range(0, 8)) AS band_idx) t
    ), cband AS (
      SELECT doc_id, sig, t.band_idx,
             md5(array_to_string(sig[t.band_idx * 2 + 1 : t.band_idx * 2 + 2], '|')) AS band_hash
      FROM csig, (SELECT unnest(range(0, 8)) AS band_idx) t
    ), near AS (
      SELECT DISTINCT b.batch_id
      FROM bband b JOIN cband c
        ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
      WHERE list_sum(list_transform(range(1, 17),
            i -> CASE WHEN b.sig[i] = c.sig[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.5
    )
    SELECT s.batch_id,
           CASE WHEN e.batch_id IS NOT NULL THEN 'exact_dup'
                WHEN n.batch_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS verdict
    FROM bsig s
    LEFT JOIN exact e USING (batch_id)
    LEFT JOIN near n USING (batch_id)
    """,
    tags=("llmdata", "dedup", "join", "pipeline"),
    doc="INCREMENTAL dedup gate — the production shape: a new batch "
    "arrives and must be admitted against the existing corpus without "
    "recomputing it. Exact tier: content-hash LEFT SEMI join. Near "
    "tier: TWO-SIDED MinHash-LSH — batch bands equi-join corpus bands "
    "(not a self-join; the corpus side's signatures would be "
    "precomputed+stored in production, so the incremental cost is "
    "O(batch) map work + one band-keyed shuffle against the corpus "
    "index). Verdict precedence exact > near > new. The batch plants "
    "all three cases: exact copies, 5-word-dropped mutations, and "
    "word-reversed texts (reversal destroys every shingle).",
)
def q_incremental_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.dedup import dedup_gate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )
    w = F.split("text", " ")
    n = F.size(w)
    batch = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("batch_id"), "text")
        .unionAll(
            docs.filter(F.col("doc_id") % 5 == 1).select(
                (F.col("doc_id") + 1000000).alias("batch_id"),
                # negative-length guard + NULL passthrough, mirroring
                # DuckDB's clamping l[1:n] / NULL-propagating
                # array_to_string (see _mutated_corpus)
                F.when(
                    F.col("text").isNotNull(),
                    F.concat_ws(
                        " ", F.slice(w, 1, F.greatest(n - 5, F.lit(0)))
                    ),
                ).alias("text"),
            )
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 5 == 2).select(
                (F.col("doc_id") + 1000000).alias("batch_id"),
                F.when(
                    F.col("text").isNotNull(),
                    F.concat_ws(" ", F.reverse(w)),
                ).alias("text"),
            )
        )
    )
    return dedup_gate(batch, docs)
