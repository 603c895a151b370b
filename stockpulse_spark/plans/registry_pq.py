"""Product quantization (PQ) — the compression path 100 TB vector
stores actually serve from (Jegou et al. 2011, "Product Quantization
for Nearest Neighbor Search"): split each 64-d vector into M=8
subvectors of 8 dims, quantize every subvector to one of K=16
codewords per subspace, store 8 nibbles instead of 256 bytes.

- pq_codebook_assign: code assignment + reconstruction error. The
  codebooks are the first K non-excluded vectors' subslices (the
  deterministic trained-k-means stand-in established by
  embedding_ivf_topk — identical plan shape to a trained codebook).
- pq_adc_recall_eval: asymmetric-distance search (query stays exact,
  database is codes; distances come from a per-query M x K lookup
  table) evaluated against brute-force exact L2 — the self-certifying
  recall@10 pattern of ann_recall_eval / minhash_lsh_recall_eval.

Determinism: subspace distances fold sequentially over identical
expressions in both engines (bit-identical doubles); every cross-row
sum (reconstruction MSE, ADC totals) is quantized to integer
micro-units per subspace FIRST, so group sums are exact BIGINT adds
and no float fold order can flip a rank or a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import not_finite

from stockpulse_spark.llmdata.similarity import _as_double
from stockpulse_spark.plans.registry import _r6, _register, _t

_M = 8  # subspaces
_SUB = 8  # dims per subspace (M * SUB = 64)
_K = 16  # codewords per subspace
_NQ = 10  # eval queries
_TOPK = 10  # recall@10
_SHORTLIST = 50  # ADC shortlist size re-ranked exactly

# d2 between the m-th subvector of two 64-d arrays, by offset indexing
# (no slicing): both engines transform to squared diffs then reduce —
# identical sequential folds, bit-identical doubles.
_D_SUBD2 = (
    "list_reduce(list_transform(range(1, {s} + 1),"
    " i -> ({a}[{m} * {s} + i] - {b}[{m} * {s} + i])"
    " * ({a}[{m} * {s} + i] - {b}[{m} * {s} + i])), (x, y) -> x + y)"
)
_S_SUBD2 = (
    "aggregate(transform(sequence(1, {s}),"
    " i -> (element_at({a}, {m} * {s} + i) - element_at({b}, {m} * {s} + i))"
    " * (element_at({a}, {m} * {s} + i) - element_at({b}, {m} * {s} + i))),"
    " 0D, (acc, x) -> acc + x)"
)


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # any-NaN vectors are corrupt uploads: excluded like NULL vectors
    # (a NaN element would poison every subspace distance and crash
    # the micro-quantizing integer cast in both engines)
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(
            F.col("embedding").isNotNull()
            & ~F.exists("embedding", lambda x: not_finite(x))
        )
        .select("vec_id", _as_double(F.col("embedding")).alias("e"))
        # spread the vector set across the cluster before the M x K
        # distance expansion: the embeddings scan is one small file at
        # test scale, and without this every interpreted subspace-L2
        # evaluation of the crossJoin ran in a SINGLE task
        # (optimization r11, guide §2.5 input skew; same idiom as the
        # corpus repartitions). Cost: one exchange of (id, vector)
        # rows; scale-adaptive via defaultParallelism.
        .repartition(spark.sparkContext.defaultParallelism)
    )


# (vec_id, m, code, d2_micro): the PQ assignment both queries share.
# codebook = subslices of the first K vectors; assignment = argmin
# subspace L2 with code tiebreak; d2 quantized to integer micro-units.
_ASSIGN_CTE = f"""
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> NOT isfinite(x))) = 0
    ), cb AS (
      SELECT vec_id AS code, e AS c FROM v WHERE vec_id < {_K}
    ), cand AS (
      SELECT v.vec_id, t.m, cb.code,
             CAST(round({_D_SUBD2.format(a='v.e', b='cb.c', m='t.m', s=_SUB)}
                        * 1000000) AS BIGINT) AS d2_micro
      FROM v CROSS JOIN range(0, {_M}) AS t(m) CROSS JOIN cb
    ), assigned AS (
      SELECT vec_id, m, code, d2_micro,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                ORDER BY d2_micro, code) AS rk
      FROM cand
    ), codes AS (
      SELECT vec_id, m, code, d2_micro FROM assigned WHERE rk = 1
    )
"""


def _codebook(v: DataFrame) -> DataFrame:
    """K codewords per subspace: subslices of the first K vectors
    (the deterministic trained-k-means stand-in) — M x K rows, KBs at
    any corpus size, always broadcast."""
    return v.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("code"), F.col("e").alias("c")
    )


def _subspace_dist(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cb: DataFrame,
    out_col: str,
) -> DataFrame:
    """(id, m, code, out_col): micro-quantized subspace L2 between
    every row's m-th subvector and every codeword — the ONE
    codebook-distance construction both PQ queries ride (assignment
    `cand` side and the per-query ADC lookup table differ only in
    which frame feeds it)."""
    spark = df.sparkSession
    ms = spark.range(_M).select(F.col("id").cast("int").alias("m"))
    return (
        df.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(cb))
        .select(
            id_col,
            "m",
            "code",
            F.round(
                F.expr(_S_SUBD2.format(a=vec_col, b="c", m="m", s=_SUB))
                * 1_000_000
            )
            .cast("bigint")
            .alias(out_col),
        )
    )


def _spark_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, code, d2_micro) — Spark mirror of _ASSIGN_CTE."""
    v = _vecs(spark, sf_dir)
    cand = _subspace_dist(v, "vec_id", "e", _codebook(v), "d2_micro")
    w = Window.partitionBy("vec_id", "m").orderBy("d2_micro", "code")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", "code", "d2_micro")
    )


@_register(
    "pq_codebook_assign",
    oracle=f"""
    WITH {_ASSIGN_CTE}
    SELECT vec_id,
           array_to_string(list(CAST(code AS VARCHAR) ORDER BY m), '-')
             AS pq_code,
           ROUND(SUM(d2_micro) * 1.0 / ({_M * _SUB} * 1000000.0), 6)
             AS recon_mse
    FROM codes
    GROUP BY vec_id
    ORDER BY vec_id
    """,
    tags=("llmdata", "similarity", "compress"),
    doc=f"Product-quantization assignment: {_M} subspaces x {_SUB} "
    f"dims, K={_K} codewords per subspace (first-{_K}-vectors "
    "codebook — the embedding_ivf_topk deterministic stand-in for "
    "trained k-means, same plan shape), code = argmin subspace L2 "
    "with code tiebreak. Output is the dash-joined nibble string "
    f"(the {_M}-byte representation replacing 256 bytes/vector) and "
    "the reconstruction MSE. Subspace distances are quantized to "
    "integer micro-units BEFORE the per-vector sum, so the MSE is an "
    "exact BIGINT add in both engines. The codebook is M x K rows "
    "(KBs at any corpus size) and broadcasts; assignment is one "
    "scan-shaped pass, one partial-agg shuffle on vec_id.",
)
def q_pq_codebook_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = _spark_assign(spark, sf_dir)
    return (
        codes.groupBy("vec_id")
        .agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "code"))),
                    lambda s: s.getField("code").cast("string"),
                ),
            ).alias("pq_code"),
            F.sum("d2_micro").alias("s_micro"),
        )
        .select(
            "vec_id",
            "pq_code",
            _r6(
                F.col("s_micro") * 1.0 / (_M * _SUB * 1_000_000.0)
            ).alias("recon_mse"),
        )
        .orderBy("vec_id")
    )


@_register(
    "pq_adc_recall_eval",
    oracle=f"""
    WITH {_ASSIGN_CTE},
    q AS (
      SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_NQ}
    ), lut AS (
      -- per-query asymmetric lookup table: d2(query subvector, every
      -- codeword) — NQ x M x K rows, metadata-sized at any scale
      SELECT q.query_id, t.m, cb.code,
             CAST(round({_D_SUBD2.format(a='q.qe', b='cb.c', m='t.m', s=_SUB)}
                        * 1000000) AS BIGINT) AS d2_micro
      FROM q CROSS JOIN range(0, {_M}) AS t(m) CROSS JOIN cb
    ), adc AS (
      SELECT l.query_id, c.vec_id AS cand_id,
             SUM(l.d2_micro) AS adc_micro
      FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
      WHERE c.vec_id != l.query_id
      GROUP BY l.query_id, c.vec_id
    ), shortlist AS (
      SELECT query_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_micro, cand_id) AS srk
      FROM adc
    ), approx AS (
      -- exact re-rank of the ADC shortlist: the PQ serving path
      SELECT s.query_id, s.cand_id,
             ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
               CAST(round({_D_SUBD2.format(a='q.qe', b='cv.e', m='0', s=64)}
                          * 1000000) AS BIGINT), s.cand_id) AS rk
      FROM (SELECT * FROM shortlist WHERE srk <= {_SHORTLIST}) s
      JOIN q ON q.query_id = s.query_id
      JOIN v cv ON cv.vec_id = s.cand_id
    ), exact AS (
      SELECT q.query_id, v.vec_id AS cand_id,
             ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
               CAST(round({_D_SUBD2.format(a='q.qe', b='v.e', m='0', s=64)}
                          * 1000000) AS BIGINT), v.vec_id) AS rk
      FROM q JOIN v ON v.vec_id != q.query_id
    )
    SELECT a.query_id,
           CAST(COUNT(e.cand_id) AS BIGINT) AS hits,
           ROUND(COUNT(e.cand_id) * 1.0 / {_TOPK}, 6) AS recall_at_{_TOPK},
           CAST(COUNT(e.cand_id) >= {_TOPK // 2} AS BOOLEAN)
             AS meets_floor
    FROM (SELECT * FROM approx WHERE rk <= {_TOPK}) a
    LEFT JOIN (SELECT * FROM exact WHERE rk <= {_TOPK}) e
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id
    GROUP BY a.query_id
    ORDER BY a.query_id
    """,
    tags=("llmdata", "similarity", "eval"),
    doc="The PQ serving path, self-certified: ADC shortlist "
    f"(top-{_SHORTLIST} by asymmetric distance — the database side "
    "is CODES only, distances come from a per-query M x K lookup "
    f"table of {_NQ}x{_M}x{_K} broadcast rows joined on (m, code)) "
    "followed by exact re-rank of just the shortlist, evaluated as "
    "recall@10 against brute-force exact L2 plus a >=0.5 floor "
    "certificate (ann_recall_eval's pattern). This is the 100 TB "
    "shape: full-corpus work touches 8 bytes/vector + one integer "
    "partial-agg; the expensive exact distance runs on "
    f"{_SHORTLIST} rows per query. ADC totals are exact BIGINT "
    "sums of micro-quantized subspace distances; every rank "
    "tiebreaks on cand_id in both engines.",
)
def q_pq_adc_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _vecs(spark, sf_dir)
    codes = _spark_assign(spark, sf_dir)
    q = v.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    lut = _subspace_dist(q, "query_id", "qe", _codebook(v), "q_d2_micro")
    adc = (
        codes.drop("d2_micro")
        .join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("q_d2_micro").alias("adc_micro"))
    )
    wa = Window.partitionBy("query_id").orderBy("adc_micro", "cand_id")
    shortlist = (
        adc.withColumn("srk", F.row_number().over(wa))
        .filter(F.col("srk") <= _SHORTLIST)
        .select("query_id", "cand_id")
    )
    exact_d2 = (
        F.round(
            F.expr(_S_SUBD2.format(a="qe", b="e", m="0", s=64))
            * 1_000_000
        ).cast("bigint")
    )
    cv = v.select(F.col("vec_id").alias("cand_id"), "e")
    wr = Window.partitionBy("query_id").orderBy("rd2", "cand_id")
    approx = (
        shortlist.join(F.broadcast(q), "query_id")
        .join(cv, "cand_id")
        .select("query_id", "cand_id", exact_d2.alias("rd2"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _TOPK)
        .select("query_id", "cand_id")
    )
    we = Window.partitionBy("e_qid").orderBy("d2", "e_cand")
    exact = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            F.col("query_id").alias("e_qid"),
            F.col("vec_id").alias("e_cand"),
            exact_d2.alias("d2"),
        )
        .withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= _TOPK)
        .select("e_qid", "e_cand")
    )
    return (
        approx.join(
            exact,
            (F.col("query_id") == F.col("e_qid"))
            & (F.col("cand_id") == F.col("e_cand")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("e_cand").alias("hits"))
        .select(
            "query_id",
            F.col("hits").cast("long").alias("hits"),
            _r6(F.col("hits") * 1.0 / _TOPK).alias(f"recall_at_{_TOPK}"),
            (F.col("hits") >= _TOPK // 2).alias("meets_floor"),
        )
        .orderBy("query_id")
    )
