"""Corpus statistics: TF-IDF top terms and the dedup keeper-assignment
step — the last mile of the text-analysis / dedup stories."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_llmdata import _MUT_CTE, _mutated_corpus


@_register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, rank, term, ROUND(tfidf, 6) AS tfidf
    FROM ranked WHERE rank <= 3
    """,
    tags=("llmdata", "text", "agg"),
    doc="TF-IDF top-3 terms per document: explode → per-doc term "
    "counts + corpus document frequencies (two partial-agg shuffles "
    "over the term key) → smoothed idf ln((N+1)/(df+1)) → per-doc "
    "top-k. The shape of every bag-of-words corpus statistic at "
    "scale; the df table is the only corpus-wide state and it is "
    "vocabulary-sized — corpus-SUBLINEAR but Heaps'-law unbounded "
    "(1e8+ terms at 100 TB), so the tf-df join carries NO broadcast "
    "hint: AQE broadcasts at test scale and falls back to a shuffle "
    "hash join on the term key at corpus scale. Only the 1-row "
    "n_docs scalar is hinted.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", _r6(F.col("tfidf")).alias("tfidf"))
    )


@_register(
    "dedup_keeper_assignment",
    oracle=_MUT_CTE
    + """
    , pairs AS (
      SELECT l.doc_id AS doc_id_1, r.doc_id AS doc_id_2
      FROM corpus l JOIN corpus r
        ON md5(array_to_string((string_split(l.text, ' '))[1:10], ' '))
         = md5(array_to_string((string_split(r.text, ' '))[1:10], ' '))
       AND l.doc_id < r.doc_id
    ), members AS (
      SELECT doc_id_1 AS doc_id, doc_id_1 AS other FROM pairs
      UNION SELECT doc_id_1, doc_id_2 FROM pairs
      UNION SELECT doc_id_2, doc_id_1 FROM pairs
      UNION SELECT doc_id_2, doc_id_2 FROM pairs
    )
    SELECT doc_id, MIN(other) AS keeper_id,
           CAST(doc_id != MIN(other) AS BOOLEAN) AS is_duplicate
    FROM members GROUP BY doc_id
    """,
    tags=("llmdata", "dedup"),
    doc="keeper assignment — the final dedup step deciding who "
    "survives: near-dup pairs (first-10-words prefix hash buckets the "
    "planted mutations with their originals) → 1-hop min-id label per "
    "member. For multi-hop chains this iterates to a fixpoint "
    "(connected components / label propagation, each iteration one "
    "self-join — genuinely iterative, noted as the non-SQL extension); "
    "1 hop is exact for the pairwise near-dup structure here; for "
    "chained evidence see dedup_keeper_transitive, which iterates "
    "min_label_components to the fixpoint.",
)
def q_dedup_keeper_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(spark, sf_dir)
    # NULL text -> NULL prefix: concat_ws would silently produce '',
    # bucketing every NULL-text doc with the empty-text docs while the
    # oracle's md5(array_to_string(NULL)) stays NULL (and NULL join
    # keys never match, on either engine)
    prefix = F.when(
        F.col("text").isNotNull(),
        F.md5(
            F.encode(
                F.concat_ws(" ", F.slice(F.split("text", " "), 1, 10)),
                "utf-8",
            )
        ),
    )
    keyed = corpus.select("doc_id", prefix.alias("pfx"))
    l = keyed.select(F.col("doc_id").alias("doc_id_1"), "pfx")
    r = keyed.select(F.col("doc_id").alias("doc_id_2"), "pfx")
    pairs = l.join(r, "pfx").filter(F.col("doc_id_1") < F.col("doc_id_2")).select(
        "doc_id_1", "doc_id_2"
    )
    members = (
        pairs.select(F.col("doc_id_1").alias("doc_id"), F.col("doc_id_1").alias("other"))
        .union(pairs.select(F.col("doc_id_1"), F.col("doc_id_2")))
        .union(pairs.select(F.col("doc_id_2"), F.col("doc_id_1")))
        .union(pairs.select(F.col("doc_id_2"), F.col("doc_id_2")))
        .distinct()
    )
    return members.groupBy("doc_id").agg(
        F.min("other").alias("keeper_id"),
        (F.col("doc_id") != F.min("other")).alias("is_duplicate"),
    )


# ---------------------------------------------------------------------------
# transitive keeper assignment (connected components over chained evidence)

_N_WORDS = "len(string_split(text, ' '))"
_CHAIN_CTE = f"""
WITH RECURSIVE corpus3 AS (
  -- residue-class synthetic ids (4i / 4i+1 / 4i+2): collision-free
  -- for any input id range (the 100x smoke caught additive offsets
  -- colliding with replica ids), and A stays the smallest per trio
  -- A: first 5 words dropped (keeps the SUFFIX), smallest ids
  SELECT doc_id * 4 AS doc_id,
         array_to_string((string_split(text, ' '))[6:{_N_WORDS}], ' ') AS text
  FROM documents WHERE {_N_WORDS} >= 21
  UNION ALL
  -- B: the original, mid ids
  SELECT doc_id * 4 + 1, text FROM documents WHERE {_N_WORDS} >= 21
  UNION ALL
  -- C: last 5 words dropped (keeps the PREFIX), largest ids
  SELECT doc_id * 4 + 2,
         array_to_string((string_split(text, ' '))[1:{_N_WORDS} - 5], ' ')
  FROM documents WHERE {_N_WORDS} >= 21
), keyed AS (
  SELECT doc_id,
         md5(array_to_string((string_split(text, ' '))[1:10], ' ')) AS pfx,
         md5(array_to_string(
           (string_split(text, ' '))[{_N_WORDS} - 9:{_N_WORDS}], ' ')) AS sfx
  FROM corpus3
), pfx_ok AS (
  -- boilerplate guard (round 9): a prefix-10 shared by more than 64
  -- docs is a banner/header, not duplication evidence — the 10x
  -- replicated corpus measured the uncapped self-join at 23x shuffle
  -- growth because its planted banner bucket is quadratic in exactly
  -- this join.  Same cap doctrine as minhash_lsh_pairs.
  SELECT pfx FROM keyed GROUP BY pfx HAVING COUNT(*) <= 64
), sfx_ok AS (
  SELECT sfx FROM keyed GROUP BY sfx HAVING COUNT(*) <= 64
), edges AS (
  SELECT l.doc_id AS src, r.doc_id AS dst
  FROM keyed l JOIN keyed r ON l.pfx = r.pfx AND l.doc_id < r.doc_id
  JOIN pfx_ok ok ON ok.pfx = l.pfx
  UNION
  SELECT l.doc_id, r.doc_id
  FROM keyed l JOIN keyed r ON l.sfx = r.sfx AND l.doc_id < r.doc_id
  JOIN sfx_ok ok ON ok.sfx = l.sfx
), sym AS (
  SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges
), reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
), comp AS (
  SELECT a AS doc_id, MIN(b) AS min_reach FROM reach GROUP BY a
)
"""


@_register(
    "dedup_keeper_transitive",
    oracle=_CHAIN_CTE
    + """
    SELECT k.doc_id,
           LEAST(k.doc_id, COALESCE(c.min_reach, k.doc_id)) AS keeper_id,
           LEAST(k.doc_id, COALESCE(c.min_reach, k.doc_id)) != k.doc_id
             AS is_duplicate
    FROM keyed k LEFT JOIN comp c USING (doc_id)
    """,
    tags=("llmdata", "dedup", "iterative"),
    doc="TRANSITIVE keeper assignment — connected components over "
    "chained near-dup evidence. The corpus plants genuine A–B–C "
    "chains: A (front-5-words dropped) matches the original B only on "
    "the suffix-10 key, C (back-5-words dropped) matches B only on the "
    "prefix-10 key, and A carries the smallest id — so C can only "
    "learn its keeper through B, which 1-hop min-id gets WRONG and "
    "connected components (operators/dedup.py:connected_components) "
    "gets right: min-label propagation under a tight cap — near-dup "
    "components are dense, diameter 2-3 — with automatic fallback to "
    "alternating large-star/small-star (Kiveris et al. SoCC'14, "
    "O(log² n) rounds on ANY shape) when the cap trips, so a 100 TB "
    "pathological chain can neither unroll unboundedly nor yield "
    "silently wrong labels. Oracle = DuckDB recursive-CTE transitive "
    "closure — exact for any component shape.",
)
def q_dedup_keeper_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split("text", " ")
    n = F.size(w)
    d = d.filter(n >= 21)
    a = d.select(
        (F.col("doc_id") * 4).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 6, n - 5)).alias("text"),
    )
    b = d.select((F.col("doc_id") * 4 + 1).alias("doc_id"), "text")
    c = d.select(
        (F.col("doc_id") * 4 + 2).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 1, n - 5)).alias("text"),
    )
    corpus3 = a.unionAll(b).unionAll(c).repartition(
        spark.sparkContext.defaultParallelism
    )
    w2 = F.split("text", " ")
    n2 = F.size(w2)
    # pin once per invocation: this frame is read on EIGHT plan
    # branches (per key: both self-join sides + the hot-bucket agg;
    # plus the CC vertex set and the final join spine), each of which
    # otherwise re-ran the 3-way corpus union + both md5 block keys
    # (optimization r11)
    keyed = corpus3.select(
        "doc_id",
        F.md5(F.encode(F.concat_ws(" ", F.slice(w2, 1, 10)), "utf-8")).alias("pfx"),
        F.md5(F.encode(F.concat_ws(" ", F.slice(w2, n2 - 9, 10)), "utf-8")).alias(
            "sfx"
        ),
    ).localCheckpoint(eager=False)
    # unpivot the two block keys into one (key_type, key_value) stream
    # (optimization r12): the per-key formulation ran 2 hot-bucket
    # groupBy jobs + 4 broadcast anti-joins + 2 self-joins + a distinct
    # over the union; one exploded stream needs ONE window-count cap
    # (the §2.4 df-cap pattern — same ≤64 bucket rule, same rows out)
    # and ONE self-join whose both sides reuse the window's
    # (kt, kv) exchange. edges need no distinct: a pair surfacing via
    # both keys is collapsed by the symmetric-edge distinct inside
    # connected_components, which was already paying that shuffle.
    tok = keyed.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("kt"), F.col("pfx").alias("kv")),
                F.struct(F.lit(1).alias("kt"), F.col("sfx").alias("kv")),
            )
        ).alias("k"),
    ).select("doc_id", "k.kt", "k.kv")
    # boilerplate guard (round 9): drop over-64 key buckets before the
    # self-join — a prefix shared by hundreds of docs is a banner, and
    # its bucket is quadratic in exactly this join (measured 23x
    # shuffle growth at 10x on the planted-banner corpus before the
    # cap).
    ok = (
        tok.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("kt", "kv"))
        )
        .filter(F.col("__df") <= 64)
        .drop("__df")
    )
    edges = (
        ok.select(F.col("doc_id").alias("src"), "kt", "kv")
        .join(ok.select(F.col("doc_id").alias("dst"), "kt", "kv"), ["kt", "kv"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    labels = connected_components(
        edges, vertices=keyed.select(F.col("doc_id")), id_col="doc_id"
    )
    # labels carries exactly one row per keyed doc_id (the vertex set
    # IS keyed's ids, and self-loops label every vertex), so the old
    # join-back onto keyed was the identity — return labels directly
    # (optimization r12; one exchange + one join removed).
    return labels.select(
        "doc_id",
        F.col("label").alias("keeper_id"),
        (F.col("label") != F.col("doc_id")).alias("is_duplicate"),
    )
