"""Final fill-outs: exact percentiles, IVF-flat ANN (completing the
task's 'IVF or LSH' with both), and the multimodal feature-extraction
kernel."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import not_finite

from stockpulse_spark.llmdata.similarity import _as_double, dot, norm
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    -- COALESCE keeps NULL-value rows (their group must survive);
    -- NaN rows are excluded: engines disagree on NaN percentiles
    WHERE COALESCE(isfinite(value), TRUE)
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "percentile"),
    doc="exact continuous percentiles (linear interpolation — Spark "
    "percentile() == DuckDB quantile_cont). At 100 TB swap in "
    "percentile_approx (t-digest, mergeable, single pass) — not "
    "oracle-checkable since sketch implementations differ.",
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        ~not_finite("value")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            *[
                _r6(F.expr(f"percentile(value, {q})")).alias(f"p{int(q * 100)}")
                for q in (0.25, 0.50, 0.75, 0.99)
            ]
        )
        .orderBy("event_type")
    )


@_register(
    "value_percentiles_approx",
    # The sketch's raw output is implementation-defined (Greenwald-
    # Khanna), so the VALUES can't be hash-compared — but the GK rank
    # GUARANTEE can: every returned quantile's feasible rank interval
    # [cnt_lt+1, cnt_le] must intersect target ± (n/accuracy + 2).
    # That boolean is engine-checkable against a literal-TRUE oracle,
    # upgrading this from a rows-only row to a driver-hashed one.
    # n_rows = COUNT(value): the GK rank interval is over NON-NULL
    # ranks (the sketch skips NULLs), so COUNT(*) over a null-bearing
    # column would bias the target rank; all-NULL groups drop on both
    # engines (HAVING here, NULL-array posexplode on the Spark side).
    oracle="""
    SELECT e.event_type, q.q, e.n_rows, TRUE AS within_gk_bound
    FROM (SELECT event_type, COUNT(value) AS n_rows
          FROM events GROUP BY event_type
          HAVING COUNT(value) > 0) e
    CROSS JOIN (SELECT CAST(unnest([0.25, 0.50, 0.75, 0.99]) AS DOUBLE)
                AS q) q
    ORDER BY e.event_type, q.q
    """,
    tags=("agg", "percentile", "approx"),
    doc="the 100 TB percentile path: approx_percentile (Greenwald-"
    "Khanna sketch, accuracy=10000 → rank error ≤ n/10000). Single "
    "pass, map-side partial sketches merged per group — no sort, no "
    "full materialization of the value set, mergeable across "
    "partitions; the exact `value_percentiles` twin needs the whole "
    "group's values in one place. The output certifies the sketch "
    "contract: each quantile's rank interval vs its target, checked "
    "by one broadcast join back over events.",
)
def q_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    qs = (0.25, 0.50, 0.75, 0.99)
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr(
            "approx_percentile(value, array("
            + ", ".join(f"{q}D" for q in qs)
            + "), 10000)"
        ).alias("ps"),
        # non-null count: the sketch's rank space excludes NULLs, and
        # an all-NULL group's NULL ps array is dropped by posexplode —
        # matching the oracle's HAVING COUNT(value) > 0
        F.count("value").alias("n_rows"),
    )
    pq = agg.select(
        "event_type",
        "n_rows",
        F.posexplode("ps").alias("qi", "p"),
    ).withColumn(
        "q",
        F.element_at(
            F.array(*[F.lit(float(q)) for q in qs]), F.col("qi") + 1
        ),
    )
    # null-safe equality: a NULL event_type group must survive the
    # certification join-back (plain equi-join drops NULL keys, and the
    # oracle keeps the group)
    ranked = (
        ev.withColumnRenamed("event_type", "__et")
        .join(
            F.broadcast(pq),
            F.col("__et").eqNullSafe(F.col("event_type")),
        )
        .groupBy("event_type", "q", "n_rows", "p")
        .agg(
            F.sum((F.col("value") < F.col("p")).cast("long")).alias("cnt_lt"),
            F.sum((F.col("value") <= F.col("p")).cast("long")).alias("cnt_le"),
        )
    )
    target = 1 + F.col("q") * (F.col("n_rows") - 1)
    bound = F.col("n_rows") / 10000.0 + 2.0
    ok = (F.col("cnt_lt") + 1 <= target + bound) & (
        F.col("cnt_le") >= target - bound
    )
    return ranked.select(
        "event_type", "q", "n_rows", ok.alias("within_gk_bound")
    ).orderBy("event_type", "q")


@_register(
    "distinct_users_approx",
    # HLL++ register values are implementation-defined, so the estimate
    # itself can't hash-match — but its RELATIVE-ERROR contract can:
    # |approx − exact| ≤ 5·rsd·exact is engine-checkable against a
    # literal-TRUE oracle (exact twin computed in the same plan),
    # upgrading this from a rows-only row to a driver-hashed one.
    oracle="""
    SELECT event_type, COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5rsd
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "approx"),
    doc="the 100 TB distinct-count path: approx_count_distinct "
    "(HyperLogLog++, rsd=2%). Constant-size mergeable sketch per "
    "group vs exact COUNT(DISTINCT)'s shuffle of every distinct key — "
    "at scale the exact form is a full repartition of the key "
    "universe, the sketch is a few KB per group. The exact count here "
    "exists only to certify the 5×rsd error bound the driver hashes; "
    "the production path is the sketch alone (exact twin: "
    "`distinct_users_by_type`).",
)
def q_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("__approx"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ok = (
        F.abs(F.col("__approx") - F.col("exact_users"))
        <= 5 * 0.02 * F.col("exact_users")
    )
    return agg.select(
        "event_type",
        "n_rows",
        "exact_users",
        ok.alias("approx_within_5rsd"),
    ).orderBy("event_type")


@_register(
    "distinct_users_sketch_rollup",
    # DataSketches HLL register values are implementation-defined, so
    # the estimate itself can't hash-match — but its error contract
    # can: |merged-sketch estimate − exact month distinct| ≤ 8%
    # (lgConfigK=12 → rsd≈1.6%, certified at 5×) is engine-checkable
    # against a literal-TRUE oracle, same pattern as
    # distinct_users_approx.
    oracle="""
    SELECT CAST(date_trunc('month', date_trunc('week', ts)) AS TIMESTAMP)
             AS mo,
           COUNT(DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP))
             AS n_weeks,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merged_within_8pct
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("agg", "approx", "rollup"),
    doc="sketch RE-AGGREGATION — the property approx_count_distinct "
    "alone never shows: per-week HLL sketches (hll_sketch_agg) are "
    "merged upward into per-month distinct estimates (hll_union_agg "
    "-> hll_sketch_estimate) without touching the raw rows again. "
    "This is the warehouse rollup contract at 100 TB: the weekly "
    "layer is a few KB per group, and any coarser period (month, "
    "quarter, all-time) derives from sketch unions in metadata-sized "
    "aggregations instead of a re-scan of the key universe. Weeks "
    "attribute to the month containing their start (deterministic).",
)
def q_distinct_users_sketch_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy(F.date_trunc("week", "ts").alias("wk")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = weekly.groupBy(F.date_trunc("month", "wk").alias("mo")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__approx"),
        F.count(F.lit(1)).alias("n_weeks"),
    )
    # the exact twin exists only to certify the merge's error bound —
    # the production rollup path is the sketch union alone
    exact = ev.groupBy(
        F.date_trunc("month", F.date_trunc("week", "ts")).alias("mo")
    ).agg(F.count_distinct("user_id").alias("exact_users"))
    ok = (
        F.abs(F.col("__approx") - F.col("exact_users"))
        <= 0.08 * F.col("exact_users")
    )
    return (
        merged.join(exact, "mo")
        .select(
            "mo",
            "n_weeks",
            "exact_users",
            ok.alias("merged_within_8pct"),
        )
        .orderBy("mo")
    )


_N_CENTROIDS = 16
_DOTC = "list_reduce(list_transform(range(1, 65), i -> e[i] * c[i]), (x, y) -> x + y)"
_NORM = "sqrt(nullif(list_reduce(list_transform(range(1, 65), i -> {v}[i] * {v}[i]), (x, y) -> x + y), 0))"


@_register(
    "embedding_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), cent AS (
      SELECT vec_id AS cid, e AS c FROM v WHERE vec_id < {_N_CENTROIDS}
    ), assigned AS (
      SELECT vec_id, e, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
               {_DOTC} / ({_NORM.format(v='e')} * {_NORM.format(v='c')}) DESC, cid) AS crank
      FROM v, cent
    ), cells AS (
      SELECT vec_id, e, cid FROM assigned WHERE crank = 1
    ), probes AS (
      SELECT vec_id AS query_id, e AS qv, cid FROM assigned
      WHERE vec_id < 10 AND crank <= 2
    ), scored AS (
      SELECT p.query_id, cand.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, 65), i -> qv[i] * cand.e[i]), (x, y) -> x + y)
               / ({_NORM.format(v='qv')} * {_NORM.format(v='cand.e')}) AS cosine
      FROM probes p JOIN cells cand USING (cid)
      WHERE p.query_id != cand.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 3
    """,
    tags=("llmdata", "similarity"),
    doc="IVF-flat ANN: the first 16 vectors act as fixed centroids "
    "(deterministic stand-in for trained k-means — same plan shape), "
    "every vector lands in its nearest-centroid cell, queries probe "
    "their 2 nearest cells (nprobe=2). Broadcast the 16-centroid dim, "
    "equi-join on cell id: candidates shrink ~16x with two small "
    "joins — the other standard ANN scale path next to SRP-LSH.",
)
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-vector norms folded ONCE and carried through assignment and
    # probe scoring (optimization r11, the srp_lsh_topk pattern): the
    # norm fold is an interpreted higher-order function, and the old
    # shape re-folded norm(e) per (vector x centroid) candidate and
    # both pair norms per probe candidate. Same doubles through the
    # same division; assignments and ranks unchanged.
    emb = (
        _t(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", _as_double(F.col("embedding")).alias("e"))
        .withColumn("en", norm(F.col("e")))
    )
    cent = emb.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("c"),
        F.col("en").alias("cn"),
    )
    cos_to_cent = dot(F.col("e"), F.col("c")) / (F.col("en") * F.col("cn"))
    w = Window.partitionBy("vec_id").orderBy(F.col("__cc").desc(), "cid")
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "e", "en", "cid", cos_to_cent.alias("__cc"))
        .withColumn("crank", F.row_number().over(w))
    )
    cells = assigned.filter(F.col("crank") == 1).select("vec_id", "e", "en", "cid")
    probes = assigned.filter(
        (F.col("vec_id") < 10) & (F.col("crank") <= 2)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qv"),
        F.col("en").alias("qn"),
        "cid",
    )
    cand = cells.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("cv"),
        F.col("en").alias("cvn"),
        "cid",
    )
    scored = (
        probes.join(cand, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cvn"))).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id", _r6(F.col("cosine")).alias("cosine"))
    )


@_register(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
      -- any-NaN vectors are corrupt and excluded (NULL rows kept:
      -- their scale/q8 stay NULL as before)
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE embedding IS NULL OR len(list_filter(embedding, x -> NOT isfinite(x))) = 0
    ), s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM v
    ), q AS (
      -- scale = 0 (all-zero vector) quantizes to all zeros instead of
      -- dividing by zero
      SELECT vec_id, e, scale,
             list_transform(e, x -> CASE WHEN scale = 0 THEN 0 ELSE
               CAST(greatest(-127, least(127,
                 floor(x / scale + 0.5))) AS INTEGER) END) AS q8
      FROM s
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           CAST(to_json(q8) AS VARCHAR) AS q8,
           ROUND(list_reduce(list_transform(range(1, 65),
                   i -> (e[i] - q8[i] * scale) * (e[i] - q8[i] * scale)),
                 (a, b) -> a + b) / 64.0, 9) AS mse
    FROM q
    """,
    tags=("llmdata", "similarity", "quantization"),
    doc="int8 symmetric quantization of the embedding column — the "
    "4× storage/bandwidth reduction every large-scale ANN index "
    "applies before sharding. Per-vector scale = max|x|/127, "
    "quantize via floor(x/scale + 0.5) (floor is bit-identical "
    "across engines where round() tie-breaking is not), clamp to "
    "[-127,127], and report per-vector reconstruction MSE. Pure "
    "Column expressions, narrow (no shuffle).",
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNull()
        | ~F.exists("embedding", lambda x: not_finite(x))
    ).select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    scale = (
        F.array_max(F.transform(F.col("e"), lambda x: F.abs(x))) / 127.0
    ).alias("scale")
    s = emb.select("vec_id", "e", scale)
    # scale = 0 (all-zero vector) -> all-zero q8; the conditional also
    # keeps ANSI mode from raising on the guarded division
    q8 = F.transform(
        F.col("e"),
        lambda x: F.when(F.col("scale") == 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / F.col("scale") + 0.5)),
            ).cast("int")
        ),
    )
    q = s.select("vec_id", "e", "scale", q8.alias("q8"))
    err = F.zip_with(
        F.col("e"),
        F.col("q8"),
        lambda x, qv: (x - qv * F.col("scale")) * (x - qv * F.col("scale")),
    )
    mse = F.aggregate(err, F.lit(0.0), lambda a, b: a + b) / 64.0
    # mse is computed in its own projection: putting it in the same
    # select as `_r6(scale) AS scale` makes Spark's lateral column
    # alias resolution bind the lambda's F.col("scale") to the ROUNDED
    # alias, silently changing the arithmetic (caught by the oracle)
    m = q.select("vec_id", "scale", "q8", mse.alias("__mse"))
    # q8 ships as a JSON string: the driver's pandas canonicalizer
    # sorts rows by every column and list cells are unhashable; int
    # arrays JSON-serialize identically in Spark and DuckDB.
    return m.select(
        "vec_id",
        _r6(F.col("scale")).alias("scale"),
        F.to_json(F.col("q8")).alias("q8"),
        (F.round(F.col("__mse") * 1e9) / 1e9).alias("mse"),
    )


@_register(
    "corpus_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), stats AS (
      SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY term
    ), ranked AS (
      SELECT term, tf, df,
             ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rank
      FROM stats
    )
    SELECT CAST(rank AS INTEGER) AS rank, term, tf, df
    FROM ranked WHERE rank <= 20
    """,
    tags=("llmdata", "text", "agg"),
    doc="corpus heavy hitters: global top-20 terms by frequency with "
    "document frequency — the vocabulary/contamination audit every "
    "corpus build runs. Explode → one partial-agg shuffle on term → "
    "TakeOrdered top-k (no global sort). At 100 TB the exact form "
    "needs the one term shuffle; the sketch alternative "
    "(count-min + heap) drops the shuffle at the cost of ±εN error.",
)
def q_corpus_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    # orderBy().limit(k) plans as TakeOrderedAndProject — each task
    # keeps a k-row heap, the driver merges 32 heaps.  The earlier
    # row_number() form funneled EVERY distinct term (billions at
    # 100 TB) through one WindowExec task.  The rank window below
    # runs on the 20 surviving rows only — metadata-sized.
    top = stats.orderBy(F.desc("tf"), F.asc("term")).limit(20)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.col("tf").desc(), "term"))
        .cast("int")
        .alias("rank"),
        "term",
        "tf",
        "df",
    )


@_register(
    "media_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 32 + 4 AS w, (doc_id * 7) % 32 + 4 AS h
      FROM documents
    ), px AS (
      SELECT d.doc_id, d.w, d.h, c.i AS c,
             CAST((d.doc_id + 31 * y.i + 7 * x.i + 83 * c.i) % 256 AS DOUBLE) AS v
      FROM dims d
      JOIN range(0, 36) y(i) ON y.i < d.h
      JOIN range(0, 36) x(i) ON x.i < d.w
      CROSS JOIN range(0, 3) c(i)
    ), stats AS (
      SELECT doc_id, w, h, c, AVG(v) AS mu, stddev_pop(v) AS sd
      FROM px GROUP BY doc_id, w, h, c
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           TRUE AS decode_ok,
           CAST(c AS INT) AS feat_idx,
           ROUND(mu / 255.0, 6) AS feat_val
    FROM stats
    UNION ALL
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           TRUE AS decode_ok,
           CAST(c + 3 AS INT) AS feat_idx,
           ROUND(sd / 255.0, 6) AS feat_val
    FROM stats
    """,
    tags=("llmdata", "multimodal"),
    doc="REAL multimodal feature extraction: each doc carries a genuine "
    "zlib-compressed PNG (pixels a closed-form function of doc_id; the "
    "encoder cycles all five PNG scanline filters), and the Spark "
    "kernel pixel-decodes it — chunk walk with CRC32 checks, IDAT "
    "inflate, full unfilter — then emits per-channel mean/stddev "
    "features (llmdata/multimodal.py:decode_png_pixels). The oracle "
    "recomputes the statistics analytically from the pixel formula, so "
    "any inflate/unfilter/channel-order bug fails the hash. Arrow "
    "mapInPandas batches bound memory; at 100 TB repartitionByRange on "
    "byte_len keeps batch sizes uniform.",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.multimodal import (
        attach_png_payload,
        extract_png_features,
    )

    d = attach_png_payload(
        _t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    out = extract_png_features(d)
    # one row per (doc, feature-index): keeps the output purely numeric
    # (the driver's pandas canonicalizer cannot sort ArrayType cells,
    # and cross-engine float→string serialization is a hash hazard).
    return out.select(
        "doc_id",
        "width",
        "height",
        "decode_ok",
        F.posexplode(F.col("feature_vec")).alias("feat_idx", "feat_val"),
    ).select(
        "doc_id",
        "width",
        "height",
        "decode_ok",
        F.col("feat_idx").cast("int").alias("feat_idx"),
        _r6(F.col("feat_val")).alias("feat_val"),
    )


_CMS_D, _CMS_W = 4, 256


def _cms_hash_sql(r: int) -> str:
    """Bucket of `term` in sketch row r — ONE expression string valid
    in both dialects (md5-derived, llmdata/hashing.py)."""
    from stockpulse_spark.llmdata.hashing import word32_sql

    inner = "concat('cms%d|', term)" % r
    return "(%s %% %d)" % (word32_sql(inner), _CMS_W)


@_register(
    "term_counts_cms",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ), pairs AS (
      {" UNION ALL ".join(
          f"SELECT term, {r} AS r, {_cms_hash_sql(r)} AS bucket FROM toks"
          for r in range(_CMS_D)
      )}
    ), cms AS (
      SELECT r, bucket, COUNT(*) AS cnt FROM pairs GROUP BY r, bucket
    ), true_tf AS (
      SELECT term, COUNT(*) AS tf FROM toks GROUP BY term
    ), top AS (
      SELECT term, tf FROM true_tf ORDER BY tf DESC, term LIMIT 20
    ), probe AS (
      {" UNION ALL ".join(
          f"SELECT term, tf, {r} AS r, {_cms_hash_sql(r)} AS bucket FROM top"
          for r in range(_CMS_D)
      )}
    )
    SELECT p.term, MAX(p.tf) AS true_tf,
           MIN(c.cnt) AS cms_estimate,
           MIN(c.cnt) - MAX(p.tf) AS overestimate
    FROM probe p JOIN cms c ON p.r = c.r AND p.bucket = c.bucket
    GROUP BY p.term
    """,
    tags=("llmdata", "sketch", "agg"),
    doc=f"count-min sketch as a pure DataFrame composition: every "
    f"term hashes into {_CMS_D} rows × {_CMS_W} buckets (md5-derived "
    "buckets, so the sketch is deterministic and oracle-checkable — "
    "the reason this novel-sketch demo can sit in the correctness "
    "gate at all), bucket counts form the sketch in ONE partial-agg "
    "shuffle of fixed size d·w regardless of corpus size, and the "
    "top-20 exact terms probe it with estimate = min over rows. "
    "overestimate ≥ 0 always (CMS guarantee, asserted in "
    "tests/test_approx.py); at 100 TB the sketch is the "
    "frequency-query structure you keep when the exact term table "
    "no longer fits.",
)
def q_term_counts_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .select("text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # NOTE (optimization r11): the sketch pass and the exact-tf pass
    # both read the exploded token stream, but pinning it measured a
    # LOSS (1.27 -> 1.36 s interleaved A/B at sf0.1): materializing
    # one row per token costs more than re-running the scan + split,
    # and both consumers partial-aggregate immediately. Deliberately
    # left as two passes.
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.expr(_cms_hash_sql(r)).alias("bucket"),
                )
                for r in range(_CMS_D)
            ]
        )
    ).alias("rb")
    cms = (
        toks.select(rb)
        .groupBy("rb.r", "rb.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    true_tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    top = true_tf.orderBy(F.col("tf").desc(), "term").limit(20)
    probe = top.select("term", "tf", rb).select(
        "term", "tf", F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probe.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("term")
        .agg(
            F.max("tf").alias("true_tf"),
            F.min("cnt").alias("cms_estimate"),
            (F.min("cnt") - F.max("tf")).alias("overestimate"),
        )
    )
