"""Round-8b governance + planner wave: k-anonymity reporting,
split-leakage measurement over the content-keyed train/val/test
split, planner-style join-cardinality estimation (heavy-hitters
exact + sampled tail), a code-vs-prose screen with a planted
codeified cohort, the closed-form LSH (bands, rows) tuning table,
and a Hill tail-index estimator for heavy-tail monitoring.

Reference parity: the reference stops at indicator math
(app/dashboard.py); these are the remaining governance / planning
operators a 100 TB training-data pipeline runs around the dedup and
sampling families: can this corpus slice be released (k-anonymity),
does the split leak near-duplicates (the property the content-keyed
split provably lacks for EXACT dups but not near-dups), how big is a
join before running it (the planner question), is code contaminating
a prose corpus, and is the LSH operating point actually the S-curve
the docstrings claim.

Scale posture (shared):
- no broadcast hint on any corpus- or vocabulary-derived frame; only
  1-row scalars and config-enumerated grids are hinted;
- the leakage audit rides the df-capped containment index (bounded
  pair expansion by construction — wave 8's machinery, reused);
- the join estimator's SKETCH branch touches only per-key counts and
  a deterministic 10% key sample + heavy-hitter set; the exact
  column exists as the test-scale certificate (a production planner
  runs only the sketch branch);
- global order statistics (Hill top-k) are TakeOrdered limits, never
  a single-task window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.localrel import values_df
from stockpulse_spark.functions.nullsafe import nan_nn
from stockpulse_spark.llmdata.hashing import hex_to_int_sql
from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_wave8 import (
    _CONTAIN_BASE_SQL,
    _containment_pairs,
    _planted_corpus,
)

# --------------------------------------------------------------------
# k-anonymity report
# --------------------------------------------------------------------

_K_ANON = 5
_LEN_BAND = 256


@_register(
    "k_anonymity_report",
    oracle=f"""
    WITH q AS (
      SELECT source, lang,
             CAST(floor(n_chars / {_LEN_BAND}.0) AS BIGINT) AS len_band
      FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL
        AND n_chars IS NOT NULL
    ), g AS (
      SELECT source, lang, len_band, CAST(COUNT(*) AS BIGINT) AS gsize
      FROM q GROUP BY 1, 2, 3
    ), r AS (
      SELECT source,
             CAST(SUM(gsize) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(MIN(gsize) AS BIGINT) AS k_anonymity,
             CAST(SUM(CASE WHEN gsize < {_K_ANON} THEN gsize ELSE 0 END)
                  AS BIGINT) AS rows_at_risk
      FROM g GROUP BY source
    )
    SELECT source, n_rows, n_groups, k_anonymity, rows_at_risk,
           CASE WHEN n_rows > 0
                THEN ROUND(rows_at_risk * 1.0 / n_rows, 6) END
             AS risk_share,
           k_anonymity >= {_K_ANON} AS k{_K_ANON}_anonymous
    FROM r ORDER BY source
    """,
    tags=("llmdata", "governance", "quality"),
    doc=f"Per-source k-anonymity over the quasi-identifier tuple "
    f"(lang, {_LEN_BAND}-char length band): group sizes, the minimum "
    f"group size (the source's k), rows in groups below k={_K_ANON}, "
    "and the at-risk share — the release-gate a corpus distributor "
    "runs before publishing per-source slices, since a (lang, "
    "length) combination held by one document re-identifies it.  "
    "Two partial-agg shuffles (quasi-group then source); every frame "
    "after the first agg is |groups|-sized.  Complement to the PII "
    "family: pii_* find identifiers IN text, this bounds linkage "
    "risk from metadata alone.",
)
def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    g = (
        d.select(
            "source",
            "lang",
            F.floor(F.col("n_chars") / float(_LEN_BAND))
            .cast("bigint")
            .alias("len_band"),
        )
        .groupBy("source", "lang", "len_band")
        .agg(F.count(F.lit(1)).alias("gsize"))
    )
    r = g.groupBy("source").agg(
        F.sum("gsize").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("gsize").cast("bigint").alias("k_anonymity"),
        F.sum(
            F.when(F.col("gsize") < _K_ANON, F.col("gsize")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rows_at_risk"),
    )
    return r.select(
        "source",
        "n_rows",
        "n_groups",
        "k_anonymity",
        "rows_at_risk",
        F.when(
            F.col("n_rows") > 0,
            _r6(F.col("rows_at_risk") * 1.0 / F.col("n_rows")),
        ).alias("risk_share"),
        (F.col("k_anonymity") >= _K_ANON).alias(f"k{_K_ANON}_anonymous"),
    ).orderBy("source")


# --------------------------------------------------------------------
# split leakage audit
# --------------------------------------------------------------------

_SPLIT_SQL = (
    f"CASE WHEN {hex_to_int_sql('md5(text)')} % 100 < 80 THEN 'train' "
    f"WHEN {hex_to_int_sql('md5(text)')} % 100 < 90 THEN 'val' "
    "ELSE 'test' END"
)


@_register(
    "split_leakage_audit",
    oracle=_CONTAIN_BASE_SQL
    + f"""
    , spl AS (
      SELECT doc_id, {_SPLIT_SQL} AS split FROM corpus
    ), lab AS (
      SELECT LEAST(s1.split, s2.split) AS split_a,
             GREATEST(s1.split, s2.split) AS split_b
      FROM pairs p
      JOIN spl s1 ON p.doc_id_1 = s1.doc_id
      JOIN spl s2 ON p.doc_id_2 = s2.doc_id
    ), agg AS (
      SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM lab GROUP BY 1, 2
    ), tot AS (
      SELECT SUM(n_pairs) AS t,
             SUM(CASE WHEN split_a <> split_b THEN n_pairs ELSE 0 END)
               AS x
      FROM agg
    )
    SELECT a.split_a, a.split_b,
           a.split_a <> a.split_b AS crosses_split,
           a.n_pairs,
           CASE WHEN t.t > 0
                THEN ROUND(a.n_pairs * 1.0 / t.t, 6) END AS pair_share,
           CASE WHEN t.t > 0
                THEN ROUND(t.x * 1.0 / t.t, 6) END AS corpus_leak_rate
    FROM agg a CROSS JOIN tot t
    ORDER BY split_a, split_b
    """,
    tags=("llmdata", "dedup", "evaluation", "governance"),
    doc="Near-duplicate leakage across the content-keyed 80/10/10 "
    "split, measured on the snippet-planted containment corpus: for "
    "every containment>=0.8 pair, which (split, split) cell it lands "
    "in, plus the corpus-wide cross-split leak rate.  The honest "
    "closure of doc_train_test_split's guarantee: an md5(text)-keyed "
    "split makes EXACT duplicate leakage impossible by construction "
    "(identical text, identical bucket — the within-split cells "
    "prove the planted snippets exist), but a NEAR-duplicate hashes "
    "independently, so ~2*p*(1-p) of near-dup pairs cross — this "
    "query turns that from an argument into a driver-hashed number, "
    "and is the evidence for running dedup BEFORE splitting (the "
    "funnel's ordering).  Same bounded plan as "
    "snippet_containment_pairs plus two metadata-sized rollups; the "
    "split labels join the pairs on doc-id equi-keys.",
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.expr(hex_to_int_sql("md5(text)")) % 100
    split = (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
    )
    spl = _planted_corpus(spark, sf_dir).select(
        "doc_id", split.alias("split")
    )
    pairs = _containment_pairs(spark, sf_dir)
    s1 = spl.select(
        F.col("doc_id").alias("doc_id_1"), F.col("split").alias("__s1")
    )
    s2 = spl.select(
        F.col("doc_id").alias("doc_id_2"), F.col("split").alias("__s2")
    )
    lab = (
        pairs.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select(
            F.least("__s1", "__s2").alias("split_a"),
            F.greatest("__s1", "__s2").alias("split_b"),
        )
    )
    # pin: agg feeds the corpus-total branch AND the final report
    # crossJoin — unpinned, the whole containment-pairs pipeline (two
    # corpus builds + shingle index + self-join) executed twice per
    # invocation. The pinned frame is <= |splits|^2 rows
    # (optimization r11).
    agg = lab.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    ).localCheckpoint(eager=False)
    tot = agg.agg(
        F.sum("n_pairs").alias("t"),
        F.sum(
            F.when(
                F.col("split_a") != F.col("split_b"), F.col("n_pairs")
            ).otherwise(F.lit(0))
        ).alias("x"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "split_a",
            "split_b",
            (F.col("split_a") != F.col("split_b")).alias("crosses_split"),
            "n_pairs",
            F.when(
                F.col("t") > 0, _r6(F.col("n_pairs") * 1.0 / F.col("t"))
            ).alias("pair_share"),
            F.when(
                F.col("t") > 0, _r6(F.col("x") * 1.0 / F.col("t"))
            ).alias("corpus_leak_rate"),
        )
        .orderBy("split_a", "split_b")
    )


# --------------------------------------------------------------------
# join cardinality estimation (planner sketch)
# --------------------------------------------------------------------

_EST_SAMPLE_MOD = 10  # deterministic 10% key sample
_EST_HH_PCT = 100  # heavy hitter: key holds >= 1/100 of its side


def _est_sql(fact_tbl: str, fact_key: str, dim_tbl: str, dim_key: str,
             name: str) -> str:
    samp = hex_to_int_sql(f"md5(CAST(a_{name}.k AS VARCHAR))")
    return f"""
    a_{name} AS (
      SELECT {fact_key} AS k, CAST(COUNT(*) AS BIGINT) AS ca
      FROM {fact_tbl} GROUP BY 1
    ), b_{name} AS (
      SELECT {dim_key} AS k, CAST(COUNT(*) AS BIGINT) AS cb
      FROM {dim_tbl} GROUP BY 1
    ), ta_{name} AS (SELECT SUM(ca) AS ta FROM a_{name}),
    tb_{name} AS (SELECT SUM(cb) AS tb FROM b_{name}),
    j_{name} AS (
      SELECT ca, cb,
             (ca * {_EST_HH_PCT} >= ta OR cb * {_EST_HH_PCT} >= tb)
               AS heavy,
             ({samp} % {_EST_SAMPLE_MOD} = 0) AS samp
      FROM a_{name} JOIN b_{name} ON a_{name}.k = b_{name}.k
      CROSS JOIN ta_{name} CROSS JOIN tb_{name}
    ), r_{name} AS (
      SELECT '{name}' AS join_name,
             CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS exact_rows,
             CAST(COALESCE(SUM(CASE WHEN heavy THEN ca * cb
                                    ELSE 0 END), 0)
                  + {_EST_SAMPLE_MOD}
                  * COALESCE(SUM(CASE WHEN NOT heavy AND samp
                                      THEN ca * cb ELSE 0 END), 0)
                  AS BIGINT) AS est_rows
      FROM j_{name}
    )"""


@_register(
    "join_cardinality_estimate",
    oracle="WITH "
    + _est_sql("lineitem", "l_orderkey", "orders", "o_orderkey",
               "lineitem_orders")
    + ","
    + _est_sql("lineitem", "l_partkey", "part", "p_partkey",
               "lineitem_part")
    + """
    SELECT join_name, exact_rows, est_rows,
           CASE WHEN exact_rows > 0
                THEN ROUND(ABS(est_rows - exact_rows) * 1.0
                           / exact_rows, 6) END AS rel_error,
           CASE WHEN exact_rows > 0
                THEN ABS(est_rows - exact_rows) * 1.0 / exact_rows
                     <= 0.25
                ELSE est_rows = exact_rows END AS within_25pct
    FROM (SELECT * FROM r_lineitem_orders
          UNION ALL SELECT * FROM r_lineitem_part)
    ORDER BY join_name
    """,
    tags=("planner", "sketches", "join"),
    doc="Planner-style join-cardinality estimation for "
    "lineitem><orders and lineitem><part WITHOUT running the joins: "
    "per-key counts on each side, heavy-hitter keys (holding >=1% of "
    "their side) contribute exactly, the tail is a deterministic "
    "md5-keyed 10% key sample scaled by 10 — the estimator every "
    "distributed planner runs before choosing a join strategy, and "
    "the heavy/tail decomposition is precisely what makes it robust "
    "to the skew the fuzz corpora plant (a 50%-hot key is ALWAYS in "
    "the exact branch, never at the mercy of the sample).  The "
    "exact_rows column is the test-scale certificate (rel_error, "
    "within-25% flag); a production planner at 100 TB computes only "
    "est_rows: two per-key partial aggs + one |keys| equi-join — "
    "never the |output| of the joins themselves.  The certificate "
    "tightens with scale (stderr ~ 1/sqrt(sampled keys)).",
)
def q_join_cardinality_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    def one(fact: DataFrame, fkey: str, dim: DataFrame, dkey: str,
            name: str) -> DataFrame:
        a = fact.groupBy(F.col(fkey).alias("k")).agg(
            F.count(F.lit(1)).alias("ca")
        )
        b = dim.groupBy(F.col(dkey).alias("k")).agg(
            F.count(F.lit(1)).alias("cb")
        )
        ta = a.agg(F.sum("ca").alias("ta"))
        tb = b.agg(F.sum("cb").alias("tb"))
        j = (
            a.join(b, "k")
            .crossJoin(F.broadcast(ta))
            .crossJoin(F.broadcast(tb))
            .select(
                "ca",
                "cb",
                (
                    (F.col("ca") * _EST_HH_PCT >= F.col("ta"))
                    | (F.col("cb") * _EST_HH_PCT >= F.col("tb"))
                ).alias("heavy"),
                (
                    F.expr(hex_to_int_sql("md5(CAST(k AS STRING))"))
                    % _EST_SAMPLE_MOD
                    == 0
                ).alias("samp"),
            )
        )
        prod = F.col("ca") * F.col("cb")
        return j.agg(
            F.coalesce(F.sum(prod), F.lit(0))
            .cast("bigint")
            .alias("exact_rows"),
            (
                F.coalesce(
                    F.sum(F.when(F.col("heavy"), prod).otherwise(F.lit(0))),
                    F.lit(0),
                )
                + _EST_SAMPLE_MOD
                * F.coalesce(
                    F.sum(
                        F.when(
                            ~F.col("heavy") & F.col("samp"), prod
                        ).otherwise(F.lit(0))
                    ),
                    F.lit(0),
                )
            )
            .cast("bigint")
            .alias("est_rows"),
        ).select(
            F.lit(name).alias("join_name"), "exact_rows", "est_rows"
        )

    li = _t(spark, sf_dir, "lineitem")
    rows = one(
        li.select("l_orderkey"),
        "l_orderkey",
        _t(spark, sf_dir, "orders").select("o_orderkey"),
        "o_orderkey",
        "lineitem_orders",
    ).unionAll(
        one(
            li.select("l_partkey"),
            "l_partkey",
            _t(spark, sf_dir, "part").select("p_partkey"),
            "p_partkey",
            "lineitem_part",
        )
    )
    err = F.abs(F.col("est_rows") - F.col("exact_rows")) * 1.0 / F.col(
        "exact_rows"
    )
    return rows.select(
        "join_name",
        "exact_rows",
        "est_rows",
        F.when(F.col("exact_rows") > 0, _r6(err)).alias("rel_error"),
        # total boolean (a NULL bool hits pandas-render divergence on
        # the empty corpus): an empty join estimated as 0 is correct
        F.when(F.col("exact_rows") > 0, err <= 0.25)
        .otherwise(F.col("est_rows") == F.col("exact_rows"))
        .alias("within_25pct"),
    ).orderBy("join_name")


# --------------------------------------------------------------------
# hash-partition skew report
# --------------------------------------------------------------------

_SKEW_BUCKETS = 32
_SKEW_FLAG = 2.0


def _skew_sql(tbl: str, key: str) -> str:
    b = hex_to_int_sql(f"md5(CAST({key} AS VARCHAR))")
    return f"""
    g_{tbl}_{key} AS (
      SELECT {b} % {_SKEW_BUCKETS} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {tbl} WHERE {key} IS NOT NULL GROUP BY 1
    ), r_{tbl}_{key} AS (
      SELECT '{tbl}.{key}' AS partition_key,
             CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
             CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_bucket
      FROM g_{tbl}_{key}
    )"""


@_register(
    "hash_partition_skew_report",
    oracle="WITH "
    + _skew_sql("events", "user_id")
    + ","
    + _skew_sql("lineitem", "l_orderkey")
    + ","
    + _skew_sql("documents", "source")
    + f"""
    SELECT partition_key, n_rows, n_buckets_used, max_bucket,
           CASE WHEN n_rows > 0
                THEN ROUND(max_bucket * {_SKEW_BUCKETS}.0 / n_rows, 6)
                END AS skew_ratio,
           CASE WHEN n_rows > 0
                THEN ROUND(max_bucket * 1.0 / n_rows, 6) END
             AS hot_bucket_share,
           CASE WHEN n_rows > 0
                THEN max_bucket * {_SKEW_BUCKETS}.0 / n_rows
                     <= {_SKEW_FLAG}
                ELSE TRUE END AS balanced
    FROM (SELECT * FROM r_events_user_id
          UNION ALL SELECT * FROM r_lineitem_l_orderkey
          UNION ALL SELECT * FROM r_documents_source)
    ORDER BY partition_key
    """,
    tags=("planner", "layout", "quality"),
    doc=f"Hash-partition skew report for the three shuffle keys the "
    f"registry leans on hardest: rows per md5 bucket (simulating a "
    f"{_SKEW_BUCKETS}-way hash exchange), the max/ideal ratio, the "
    "hot-bucket share, and a balanced flag at skew <= "
    f"{_SKEW_FLAG} — the design tool that says which keys can carry "
    "a shuffle and which need salting BEFORE a job OOMs at scale.  "
    "On the generated corpus it shows the design rationale as "
    "numbers: the high-cardinality l_orderkey hashes flat "
    "(balanced) while documents.source — ~20 distinct values into "
    f"{_SKEW_BUCKETS} buckets — is structurally skewed (measured "
    "3.2x at sf0.001), which is exactly why every per-source rollup "
    "here pre-aggregates on (source, x) composite keys and why the "
    "salted operators (operators/skew.py) exist; events.user_id "
    "lands balanced only once user cardinality outgrows the bucket "
    "count — the cardinality-dependence the report quantifies.  One "
    "|buckets|-cell partial agg per key; everything after is "
    "metadata-sized.",
)
def q_hash_partition_skew_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    def one(tbl: str, key: str, label: str) -> DataFrame:
        g = (
            _t(spark, sf_dir, tbl)
            .filter(F.col(key).isNotNull())
            .select(
                (
                    F.expr(hex_to_int_sql(f"md5(CAST({key} AS STRING))"))
                    % _SKEW_BUCKETS
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return g.agg(
            F.coalesce(F.sum("n"), F.lit(0))
            .cast("bigint")
            .alias("n_rows"),
            F.count(F.lit(1)).alias("n_buckets_used"),
            F.coalesce(F.max("n"), F.lit(0))
            .cast("bigint")
            .alias("max_bucket"),
        ).select(
            F.lit(label).alias("partition_key"),
            "n_rows",
            "n_buckets_used",
            "max_bucket",
        )

    rows = (
        one("events", "user_id", "events.user_id")
        .unionAll(one("lineitem", "l_orderkey", "lineitem.l_orderkey"))
        .unionAll(one("documents", "source", "documents.source"))
    )
    skew = F.col("max_bucket") * float(_SKEW_BUCKETS) / F.col("n_rows")
    return rows.select(
        "partition_key",
        "n_rows",
        "n_buckets_used",
        "max_bucket",
        F.when(F.col("n_rows") > 0, _r6(skew)).alias("skew_ratio"),
        F.when(
            F.col("n_rows") > 0,
            _r6(F.col("max_bucket") * 1.0 / F.col("n_rows")),
        ).alias("hot_bucket_share"),
        F.when(F.col("n_rows") > 0, skew <= _SKEW_FLAG)
        .otherwise(F.lit(True))
        .alias("balanced"),
    ).orderBy("partition_key")


# --------------------------------------------------------------------
# code-vs-prose screen with planted codeified cohort
# --------------------------------------------------------------------

_CODE_SYM_THRESHOLD = 0.05
_CODE_PAREN_PER100 = 1.0


@_register(
    "code_detect_eval",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             {hex_to_int_sql("md5(text)")} % 100 AS bucket
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ), corpus AS (
      -- no synthetic ids at all: the screen reads features per row
      -- and ids never join, so the corpus carries only (text, cohort)
      SELECT text, 'natural' AS cohort FROM base
      UNION ALL
      SELECT 'def f(' || replace(text, ' ', '(x); ') || ') {{ return 0; }}',
             'planted_code'
      FROM base WHERE bucket >= 90
    ), feat AS (
      SELECT cohort,
             length(text) AS n_chars,
             length(text)
               - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
               AS n_sym,
             length(text) - length(replace(text, '(', '')) AS n_paren
      FROM corpus
    ), scored AS (
      SELECT cohort,
             n_sym * 1.0 / n_chars AS sym_ratio,
             n_paren * 100.0 / n_chars AS paren_per_100
      FROM feat WHERE n_chars > 0
    )
    SELECT cohort,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sym_ratio > {_CODE_SYM_THRESHOLD}
                          AND paren_per_100 > {_CODE_PAREN_PER100}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           ROUND(SUM(CASE WHEN sym_ratio > {_CODE_SYM_THRESHOLD}
                           AND paren_per_100 > {_CODE_PAREN_PER100}
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS flag_rate,
           ROUND(AVG(sym_ratio), 6) AS avg_sym_ratio,
           ROUND(AVG(paren_per_100), 6) AS avg_paren_per_100
    FROM scored GROUP BY cohort ORDER BY cohort
    """,
    tags=("llmdata", "text", "quality", "evaluation"),
    doc="Code-vs-prose screen with a measured catch rate: flags a "
    f"document as code when symbol density > {_CODE_SYM_THRESHOLD} "
    f"AND parentheses per 100 chars > {_CODE_PAREN_PER100} — the "
    "register filter a prose-corpus curator runs (code contaminating "
    "a prose corpus shifts every downstream quality metric), with "
    "the same planted-cohort honesty contract as the containment "
    "tier: every eval-bucket document is codeified "
    "deterministically (words wrapped in '(x); ' call syntax) and "
    "the per-cohort flag rates are the driver-hashed evidence that "
    "the screen separates the cohorts (natural word-salad prose has "
    "ZERO symbols, so its rate is exactly 0.0 and the planted rate "
    "1.0 — closed form, asserted in tests).  Entirely in-row feature "
    "extraction (length/replace/regexp_replace inside the scan "
    "projection, no explode) + one |cohorts|-cell partial agg — the "
    "cheapest corpus-pass shape, same as tokenizer_fertility.",
)
def q_code_detect_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            "text",
            (F.expr(hex_to_int_sql("md5(text)")) % 100).alias("bucket"),
        )
    )
    corpus = base.select(
        "text", F.lit("natural").alias("cohort")
    ).unionAll(
        base.filter(F.col("bucket") >= 90).select(
            F.concat(
                F.lit("def f("),
                F.regexp_replace("text", " ", "(x); "),
                F.lit(") { return 0; }"),
            ).alias("text"),
            F.lit("planted_code").alias("cohort"),
        )
    )
    feat = corpus.select(
        "cohort",
        F.length("text").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
        ).alias("n_sym"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "\\(", ""))
        ).alias("n_paren"),
    ).filter(F.col("n_chars") > 0)
    scored = feat.select(
        "cohort",
        (F.col("n_sym") * 1.0 / F.col("n_chars")).alias("sym_ratio"),
        (F.col("n_paren") * 100.0 / F.col("n_chars")).alias(
            "paren_per_100"
        ),
    )
    is_code = (F.col("sym_ratio") > _CODE_SYM_THRESHOLD) & (
        F.col("paren_per_100") > _CODE_PAREN_PER100
    )
    return (
        scored.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(is_code, 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            _r6(
                F.sum(F.when(is_code, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1))
            ).alias("flag_rate"),
            _r6(F.avg("sym_ratio")).alias("avg_sym_ratio"),
            _r6(F.avg("paren_per_100")).alias("avg_paren_per_100"),
        )
        .orderBy("cohort")
    )


# --------------------------------------------------------------------
# LSH tuning curve (closed-form S-curve certificate)
# --------------------------------------------------------------------

_LSH_CONFIGS = ((8, 4), (16, 4), (32, 4), (8, 8), (16, 8), (64, 2))
_LSH_JACCARDS = (0.3, 0.5, 0.7, 0.8, 0.9, 0.95)


@_register(
    "lsh_tuning_curve",
    oracle=f"""
    WITH cfg AS (
      SELECT * FROM (VALUES
        {", ".join(f"({b}, {r})" for b, r in _LSH_CONFIGS)}
      ) AS t(bands, rows_per_band)
    ), jj AS (
      SELECT * FROM (VALUES
        {", ".join(f"(CAST({j} AS DOUBLE))" for j in _LSH_JACCARDS)}
      ) AS t(jaccard)
    )
    SELECT bands, rows_per_band, jaccard,
           ROUND(1.0 - POWER(1.0 - POWER(jaccard, rows_per_band),
                             bands), 6) AS p_detect,
           ROUND(POWER(1.0 / bands, 1.0 / rows_per_band), 6)
             AS s_curve_threshold
    FROM cfg CROSS JOIN jj
    ORDER BY bands, rows_per_band, jaccard
    """,
    tags=("llmdata", "dedup", "planner"),
    doc="The closed-form LSH S-curve over candidate (bands, "
    "rows-per-band) configurations x a Jaccard grid: detection "
    "probability 1-(1-j^r)^b and the curve's threshold (1/b)^(1/r) — "
    "the tuning table that justifies doc_minhash_lsh's operating "
    "point as arithmetic instead of prose (at (16,4): j=0.8 is "
    "caught w.p. ~0.9997 while j=0.5 stays under 0.64 — read the "
    "certified numbers off the result, they are driver-hashed).  A "
    "config-enumerated literal grid (|configs| x |jaccards| rows, "
    "metadata-sized by construction): zero table scans, zero "
    "shuffles — the one query class where a broadcast-sized frame "
    "claim is exact rather than argued.",
)
def q_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the grid is expanded driver-side (36 literal rows): a crossJoin
    # of two unbroadcast literal frames would plan a CartesianProduct
    # with |left partitions| x |right partitions| tasks — measured
    # 1024 tasks / 45 s for 36 rows before this was flattened.
    # VALUES LocalRelation, not createDataFrame: the pickled-RDD form
    # of this zero-scan query still ran 32 Python-worker tasks per
    # action — 4.4 s measured for 36 rows (optimization r11).
    grid = values_df(
        spark,
        [(b, r, float(j)) for b, r in _LSH_CONFIGS for j in _LSH_JACCARDS],
        ["bands", "rows_per_band", "jaccard"],
    )
    p = 1.0 - F.pow(
        1.0 - F.pow(F.col("jaccard"), F.col("rows_per_band")),
        F.col("bands"),
    )
    thr = F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows_per_band"))
    return (
        grid
        .select(
            "bands",
            "rows_per_band",
            "jaccard",
            _r6(p).alias("p_detect"),
            _r6(thr).alias("s_curve_threshold"),
        )
        .orderBy("bands", "rows_per_band", "jaccard")
    )


# --------------------------------------------------------------------
# Hill tail-index estimator
# --------------------------------------------------------------------

_HILL_TOPK = 100


@_register(
    "hill_tail_index",
    oracle=f"""
    WITH v AS (
      SELECT CASE WHEN NOT isfinite(o_totalprice) THEN NULL
                  ELSE o_totalprice END AS x
      FROM orders
    ), pos AS (
      SELECT x FROM v WHERE x IS NOT NULL AND x > 0
    ), top AS (
      SELECT x FROM pos ORDER BY x DESC LIMIT {_HILL_TOPK + 1}
    ), thr AS (
      SELECT MIN(x) AS threshold, CAST(COUNT(*) AS BIGINT) AS n_top
      FROM top
    ), exceed AS (
      SELECT t.x, thr.threshold FROM top t CROSS JOIN thr
      WHERE t.x > thr.threshold
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exceed,
             AVG(ln(x / threshold)) AS hill_inv
      FROM exceed
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_values FROM pos
    )
    SELECT n.n_values, thr.n_top, s.n_exceed,
           ROUND(thr.threshold, 6) AS threshold,
           CASE WHEN s.n_exceed > 0
                THEN ROUND(s.hill_inv, 6) END AS hill_inv,
           CASE WHEN s.hill_inv > 0
                THEN ROUND(1.0 / s.hill_inv, 6) END AS tail_alpha
    FROM stats s CROSS JOIN thr CROSS JOIN n
    """,
    tags=("stats", "risk", "topk"),
    doc=f"Hill tail-index over order totals: threshold = the "
    f"{_HILL_TOPK + 1}-th largest value, Hill estimator = mean "
    "ln(x/threshold) over the exceedances, tail alpha = its inverse "
    "— the extreme-value diagnostic that says whether the value "
    "distribution is power-law-tailed (alpha <= 2: variance is "
    "INFINITE and every mean-based monitor is unstable) or "
    "well-behaved, which is exactly the number that decides if "
    "percentile monitors (hourly_p95_by_type) can be trusted.  The "
    "top-(k+1) frame is a TakeOrdered limit (never a global sort or "
    "single-task window); everything after is a <=101-row frame.  "
    "Tie-safe by construction: only the top frame's VALUE multiset "
    "is used (threshold + exceedances strictly above it), so "
    "arbitrary tie-breaking at the boundary cannot change the "
    "answer.  Non-finite money masks to NULL per the engine-wide "
    "contract.",
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = (
        _t(spark, sf_dir, "orders")
        .select(nan_nn("o_totalprice").alias("x"))
        .filter(F.col("x").isNotNull() & (F.col("x") > 0))
    )
    top = pos.orderBy(F.desc("x")).limit(_HILL_TOPK + 1)
    thr = top.agg(
        F.min("x").alias("threshold"),
        F.count(F.lit(1)).alias("n_top"),
    )
    exceed = top.crossJoin(F.broadcast(thr)).filter(
        F.col("x") > F.col("threshold")
    )
    stats = exceed.agg(
        F.count(F.lit(1)).alias("n_exceed"),
        F.avg(F.log(F.col("x") / F.col("threshold"))).alias("hill_inv"),
    )
    n = pos.agg(F.count(F.lit(1)).alias("n_values"))
    return (
        stats.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(n))
        .select(
            "n_values",
            "n_top",
            "n_exceed",
            _r6(F.col("threshold")).alias("threshold"),
            F.when(F.col("n_exceed") > 0, _r6(F.col("hill_inv"))).alias(
                "hill_inv"
            ),
            F.when(
                F.col("hill_inv") > 0, _r6(1.0 / F.col("hill_inv"))
            ).alias("tail_alpha"),
        )
    )
