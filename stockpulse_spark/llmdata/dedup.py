"""Deduplication families for document corpora.

Four tiers, cheapest first — a real 100 TB pipeline runs them as a
funnel (exact → fingerprint buckets → MinHash-LSH candidates → exact
Jaccard verify), each stage shrinking the candidate set the next one
pays for:

    exact          md5(text) hash-groupBy — one shuffle on a 32-byte key
    simhash        32-bit sign-vote hash; equal-hash buckets ≈ near-dups
    minhash_lsh    k-permutation MinHash, banded self-join → candidate
                   pairs with estimated Jaccard (sub-quadratic)
    ngram_jaccard  exact Jaccard over shingle sets for a bounded
                   candidate set (the verify stage)

All JVM-side: shingles/hashes via higher-order array functions — no
Python UDFs — so the hot path is codegen'd and Arrow never pays a
row-transfer tax. Hashes are md5-derived (llmdata/hashing.py) so every
operator keeps a DuckDB oracle.

Scale notes: the LSH self-join shuffles on (band_idx, band_hash) —
band count tunes the recall/cost curve; skewed buckets (boilerplate
docs) are handled by AQE skew-join or a bucket-size cap filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.hashing import word32_sql


def word_ngrams_sql(text_sql: str, n: int) -> str:
    """SQL-text form of word_ngrams over a column reference / SQL
    fragment — one F.expr() parse instead of ~30 py4j round trips of
    Column-object construction (optimization r11: query construction
    runs inside the bench's timed region; the JVM SQL parser builds the
    same expression tree in one call). Semantically identical to
    word_ngrams below — every function and guard mirrored 1:1."""
    w = f"split({text_sql}, ' ')"
    m = f"(size({w}) - {n - 1})"
    z = f"slice({w}, 1, {m})"
    for k in range(1, n):
        z = (
            f"zip_with({z}, slice({w}, {k + 1}, {m}), "
            f"(a, b) -> concat_ws(' ', a, b))"
        )
    return f"CASE WHEN {m} < 1 THEN CAST(array() AS ARRAY<STRING>) ELSE {z} END"


def shingles_sql(text_sql: str, n: int = 3) -> str:
    """SQL-text form of shingles (array_distinct over word_ngrams)."""
    return f"array_distinct({word_ngrams_sql(text_sql, n)})"


def minhash_signature_sql(text_sql: str, k: int = 16, shingle_n: int = 3) -> str:
    """SQL-text form of minhash_signature — same expression tree via
    one parser call (see word_ngrams_sql)."""
    sh = shingles_sql(text_sql, shingle_n)
    digests = ", ".join(
        f"md5(encode(concat('{j}|', s), 'utf-8'))" for j in range(k)
    )
    per_shingle = f"transform({sh}, s -> array({digests}))"
    nulls = f"array_repeat(CAST(NULL AS STRING), {k})"
    folded = (
        f"aggregate({per_shingle}, {nulls}, "
        f"(acc, hs) -> zip_with(acc, hs, (a, b) -> least(a, b)))"
    )
    return f"CASE WHEN ({sh}) IS NULL THEN {nulls} ELSE {folded} END"


def word_ngrams(text: Column | str, n: int) -> Column:
    """Ordered (non-distinct) word n-grams of a text column, joined
    by single spaces. Accepts a column NAME (built via one F.expr
    parse — see word_ngrams_sql) or a Column expression (tree form).

    Round 10 (the 1000x decade finding): built with zip_with over n
    word-offset slices instead of `transform(sequence, i ->
    slice(w, i, n))`.  Higher-order functions are CodegenFallback —
    they ALWAYS run interpreted — and an interpreted lambda re-
    evaluates every expression it CAPTURES once per element, so the
    old form re-ran split(text) (and the whole upstream text-mutation
    expression feeding it) for each of the w shingle positions:
    O(w * (L + mutation)) per doc, the stall that pinned the 1000x
    doc_minhash_lsh run at ~47 CPU-minutes per task.  zip_with's
    lambda touches only its own lambda variables (no capture), and
    the n slice children are evaluated once per ROW: O(n * L) per
    doc.  Same output bit-for-bit, including the short-doc guard
    (docs under n words get an empty array, never an illegal slice)
    and NULL text -> NULL.
    """
    if isinstance(text, str):
        return F.expr(word_ngrams_sql(f"`{text}`", n))
    w = F.split(text, " ")
    m = F.size(w) - (n - 1)  # n-gram count when positive
    z: Column | None = None
    for k in range(n):
        part = F.slice(w, k + 1, m)
        z = part if z is None else F.zip_with(
            z, part, lambda a, b: F.concat_ws(" ", a, b)
        )
    assert z is not None
    return F.when(m < 1, F.array().cast("array<string>")).otherwise(z)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (word_ngrams +
    array_distinct; see word_ngrams for the round-10 zip_with form)."""
    if isinstance(text, str):
        return F.expr(shingles_sql(f"`{text}`", n))
    return F.array_distinct(word_ngrams(text, n))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → keeper id + count."""
    return (
        df.groupBy(F.md5(F.encode(F.col(text_col), "utf-8")).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signature(
    text: Column | str, k: int = 16, shingle_n: int = 3
) -> Column:
    """k-permutation MinHash signature as an array of k hex strings.

    Permutation j is the md5 keyed by the salt prefix 'j|'; the min is
    the lexicographic min over shingle digests — order-free, merge-
    friendly (min is associative → partial aggregation works).

    Round 10 (the 1000x decade finding, same class as shingles): the
    old form built k separate `array_min(transform(sh, ...))`
    expressions, and since higher-order functions run interpreted
    (CodegenFallback), each of the k transforms re-evaluated the
    captured `sh` — the full shingle set INCLUDING split and any
    upstream text-mutation expression — once per row, k times over.
    Now `sh` is the array ARGUMENT of one transform (evaluated once
    per row); the per-element lambda emits the k salted digests of
    its own lambda variable (no outer capture), and one
    aggregate/zip_with/least fold takes the per-permutation minima.
    Output is bit-identical: least() and array_min() share the UTF8
    binary string ordering and both skip NULLs, an empty shingle set
    folds to the all-NULL init exactly as array_min(empty) was NULL,
    and NULL text still yields an array of k NULLs via the guard.

    NOTE the per-shingle lambda must stay single-argument: PySpark
    calls a two-parameter transform() lambda as (element, INDEX), so a
    two-arg closure would silently salt by shingle position.
    """
    if isinstance(text, str):
        return F.expr(minhash_signature_sql(f"`{text}`", k, shingle_n))
    sh = shingles(text, shingle_n)
    per_shingle = F.transform(
        sh,
        lambda s: F.array(
            *[
                F.md5(F.encode(F.concat(F.lit(f"{j}|"), s), "utf-8"))
                for j in range(k)
            ]
        ),
    )
    nulls = F.array_repeat(F.lit(None).cast("string"), k)
    folded = F.aggregate(
        per_shingle,
        nulls,
        lambda acc, hs: F.zip_with(acc, hs, lambda a, b: F.least(a, b)),
    )
    return F.when(sh.isNull(), nulls).otherwise(folded)



def minhash_sig_from_shingles_sql(sh_sql: str, k: int = 16) -> str:
    """Signature from an ALREADY-PROJECTED shingle-array column.

    Two-select shape (optimization r11): computing the shingle array
    once into its own projection and taking k separate
    array_min(transform(sh, s -> md5(...))) walks beats the
    transform+aggregate/zip_with fold by ~25% measured (interleaved
    noop A/B at sf0.1: 1.06s -> 0.82s) — the fold allocates a k-element
    array per shingle per row, the k walks allocate none, and each
    transform's argument is a cheap attribute read so nothing upstream
    is re-evaluated (the round-10 interpreted-HOF capture rule).
    CollapseProject keeps the barrier: the shingle expression is
    non-cheap and referenced k+1 times, so Catalyst does not re-inline
    it. Output is bit-identical to minhash_signature: array_min and
    least share the UTF8 ordering and NULL-skip, an empty shingle
    array gives array_min(empty) = NULL in every slot, and a NULL
    array hits the same all-NULL guard.
    """
    mins = ", ".join(
        f"array_min(transform({sh_sql}, "
        f"s -> md5(encode(concat('{j}|', s), 'utf-8'))))"
        for j in range(k)
    )
    return (
        f"CASE WHEN {sh_sql} IS NULL "
        f"THEN array_repeat(CAST(NULL AS STRING), {k}) "
        f"ELSE array({mins}) END"
    )


def _shared_signatures(sig: DataFrame) -> DataFrame:
    """Materialize the signature table once PER QUERY INVOCATION so the
    three plan branches that read it (banding + the two pair-side
    rejoins) share one computation, without any reuse across
    invocations.

    localCheckpoint — not persist() — is deliberate: persist() registers
    the plan in Spark's CacheManager, which is keyed by the CANONICALIZED
    plan, so a re-built identical query (every timed bench run rebuilds
    the DataFrame) would silently read the previous run's materialized
    signatures instead of computing from the parquet input. A lazy
    localCheckpoint materializes fresh RDD partitions on each
    invocation's first job and is garbage-collected with the DataFrame,
    so every run pays the full signature computation while still
    computing it exactly once within the run."""
    return sig.localCheckpoint(eager=False)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    bucket_cap: int | None = 64,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    signature (k mins) → `bands` band-hashes → ONE shuffle grouping
    (band_idx, band_hash) into capped member buckets → in-bucket
    pairwise expansion (id1 < id2) with the estimated Jaccard
    (matching signature positions / k) computed at emission →
    distinct → threshold filter. Sub-quadratic: only docs sharing a
    band bucket are compared.

    Shape (optimization r11): the earlier formulation read the
    signature table on THREE plan branches (band self-join plus two
    per-side signature rejoins), which required a per-invocation
    localCheckpoint to avoid recomputing signatures and paid seven
    exchanges end to end. Grouping members per bucket reads the
    signatures exactly once — no checkpoint, no rejoins, two exchanges
    total (band groupBy + pair distinct). The deliberate trade: the
    band exchange carries the k-hash signature (k·33 B ≈ 0.5 KB) per
    (doc, band) instead of the id alone, but the two whole-table
    signature rejoin shuffles and the self-join's second side
    disappear, and per-key state stays bounded — a bucket array holds
    ≤ bucket_cap member structs (64 · 0.5 KB = 32 KB worst case), the
    same bound the cap already imposed on pair fan-out.

    `bucket_cap` is the boilerplate guard: a band bucket holding B
    docs contributes B²/2 pairs, so one shared header/footer across a
    web crawl (cookie banners, license preambles) turns the bucket
    expansion quadratic on exactly the hottest key. Buckets larger
    than the cap are DROPPED before expansion — a bucket that big is
    boilerplate evidence, not duplication evidence (its members still
    pair through their other, content-derived bands). The skew is
    removed at the source rather than absorbed, which is what survives
    a 100 TB crawl with a million-document banner bucket; the cap now
    also bounds the grouped-member arrays, giving the one stateful
    stage an O(cap) per-key memory certificate.
    """
    sh_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(shingles_sql(f"`{text_col}`", shingle_n)).alias("__sh"),
    )
    return minhash_lsh_pairs_from_shingles(
        sh_df,
        sh_col="__sh",
        id_col="doc_id",
        k=k,
        bands=bands,
        threshold=threshold,
        bucket_cap=bucket_cap,
    )


def minhash_lsh_pairs_from_shingles(
    sh_df: DataFrame,
    sh_col: str = "sh",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    bucket_cap: int | None = 64,
) -> DataFrame:
    """minhash_lsh_pairs from an ALREADY-COMPUTED shingle-array frame
    `(id_col, sh_col)`.

    Callers that also need the shingle sets downstream (the funnel /
    pipeline / precision queries all re-join shingles for the exact
    Jaccard verify) compute the shingle frame once, pin it with one
    lazy localCheckpoint, and pass it here — the candidate stage and
    the verify stage then share one shingle computation per invocation
    instead of running the corpus mutation + shingle transform twice
    (optimization r11; same per-invocation-pin policy as
    _shared_signatures, no reuse across invocations).
    """
    r = k // bands
    sig = sh_df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(minhash_sig_from_shingles_sql(f"`{sh_col}`", k)).alias("sig"),
    )
    band_cells = ", ".join(
        f"struct({b} AS band_idx, md5(encode(concat_ws('|', "
        f"slice(sig, {b * r + 1}, {r})), 'utf-8')) AS band_hash)"
        for b in range(bands)
    )
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(F.expr(f"array({band_cells})")).alias("band"),
    ).select("doc_id", "sig", "band.band_idx", "band.band_hash")
    buckets = banded.groupBy("band_idx", "band_hash").agg(
        F.collect_list(F.struct("doc_id", "sig")).alias("members")
    )
    if bucket_cap is not None:
        buckets = buckets.filter(F.size("members") <= bucket_cap)
    # in-bucket pairwise expansion; est_jaccard is computed at emission
    # (deterministic per pair), so the distinct collapses the same pair
    # surfacing via several bands without any signature rejoin
    pair_expr = (
        "flatten(transform(members, m1 -> "
        "transform(filter(members, m2 -> m1.doc_id < m2.doc_id), "
        "m2 -> struct(m1.doc_id AS doc_id_1, m2.doc_id AS doc_id_2, "
        "size(filter(zip_with(m1.sig, m2.sig, (a, b) -> (a = b)), x -> x)) "
        f"/ CAST({k} AS DOUBLE) AS est_jaccard))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_id_1", "p.doc_id_2", "p.est_jaccard")
        .distinct()
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash32(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash per document.

    Per-token 32-bit md5-derived hash (token multiset — duplicates
    vote multiple times, the standard Charikar construction); per-bit
    vote Σ(±1); bit set where the vote is positive. Shape: explode
    tokens → hash once per token → 32 conditional sums in ONE
    aggregation (map-side partial agg makes this linear, no window).

    Equal simhash → near-dup bucket; Hamming-distance joins over bit
    chunks extend this to distance ≤ d at scale.
    """
    # Spread the scan before the token explode (optimization r11, the
    # single-split expansion class): documents is one parquet file, so
    # the per-token md5 and the 32 per-token bit votes otherwise run
    # in a single task. The repartition shuffles doc rows, not tokens;
    # per-doc vote sums are partition-independent integers.
    spread = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    toks = spread.select(
        "doc_id",
        F.explode(F.split(F.col("__t"), " ")).alias("tok"),
    ).withColumn("h", F.expr(word32_sql("tok")))
    # (h >> b) & 1, not floor(h / 2^b) % 2: h is a non-negative BIGINT
    # (32-bit md5 word), so the shift is bit-identical to the float
    # divide/floor/mod chain and ~10x cheaper per token-bit
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(32)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(32):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(int(2**b))).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "source",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets within candidate
    groups (`group_col`), via a per-group INVERTED INDEX.

    Round 8 replaced the row-level within-group self-join: that form
    is quadratic in GROUP size — fine when the group is an LSH bucket
    (its intended scale path) but the registered query groups by
    `source`, and at the sf1 sweep's 2.5k-doc source groups it meant
    62M array intersections per engine.  The index form only ever
    materializes pairs that SHARE a shingle (cost Σ df² per (group,
    shingle) key), recovering the union as |A| + |B| − |A∩B|.  For
    any threshold > 0 the output is identical: a no-shared-shingle
    pair has Jaccard 0 (or NULL when both sets are empty) and never
    passes the filter, so never materializing it changes nothing.
    `threshold` is asserted > 0 to keep that equivalence a contract.
    """
    assert threshold > 0, "inverted-index form requires threshold > 0"
    grp = (
        [F.col(group_col).alias("grp")]
        if group_col
        else [F.lit(1).alias("grp")]
    )
    # one per-invocation materialization of the shingle arrays: the
    # frame feeds THREE plan branches (both self-join sides via tok,
    # plus sizes) and shingling — split + n-grams + distinct per doc —
    # is the expensive part; unpinned, each branch recomputes it
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        *grp,
        shingles(text_col, shingle_n).alias("sh"),
    ).localCheckpoint(eager=False)
    tok = sh.select("doc_id", "grp", F.explode("sh").alias("s"))
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    l, r = tok.alias("l"), tok.alias("r")
    inter = (
        l.join(
            r,
            on=[
                F.col("l.grp") == F.col("r.grp"),
                F.col("l.s") == F.col("r.s"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_id_1"),
            F.col("r.doc_id").alias("doc_id_2"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    n1 = sizes.select(
        F.col("doc_id").alias("doc_id_1"), F.col("n_sh").alias("__n1")
    )
    n2 = sizes.select(
        F.col("doc_id").alias("doc_id_2"), F.col("n_sh").alias("__n2")
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("__n1") + F.col("__n2") - F.col("n_inter")
    )
    return (
        inter.join(n1, "doc_id_1")
        .join(n2, "doc_id_2")
        .select("doc_id_1", "doc_id_2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_gate(
    batch: DataFrame,
    corpus: DataFrame,
    batch_id_col: str = "batch_id",
    corpus_id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Two-tier admission gate for NEW documents against an existing
    corpus — the incremental-ingest shape (used by the
    incremental_dedup_gate query and the streaming curation sink):

    - exact tier: content-hash LEFT SEMI join;
    - near tier: TWO-SIDED MinHash-LSH — batch band hashes equi-join
      corpus band hashes (in production the corpus side is a
      precomputed index, so incremental cost is O(batch) map work plus
      one band-keyed shuffle), estimated Jaccard >= threshold.

    Returns (batch_id_col, verdict) with verdict in
    ('exact_dup', 'near_dup', 'new'); precedence exact > near > new.
    """
    r = k // bands
    # pin both signature frames once per invocation: bsig is read on
    # THREE plan branches (exact tier, band tier, final verdict spine)
    # and csig on two (exact tier's distinct, band tier), so without
    # the pins each branch re-ran the md5 + k-permutation MinHash over
    # its input (optimization r11; same per-invocation-pin policy as
    # _shared_signatures — no reuse across invocations)
    bsig = batch.select(
        F.col(batch_id_col),
        F.md5(text_col).alias("th"),
        minhash_signature(text_col, k).alias("sig"),
    ).localCheckpoint(eager=False)
    csig = corpus.select(
        F.col(corpus_id_col),
        F.md5(text_col).alias("th"),
        minhash_signature(text_col, k).alias("sig"),
    ).localCheckpoint(eager=False)
    exact = (
        bsig.join(csig.select("th").distinct(), "th", "left_semi")
        .select(batch_id_col)
        .distinct()
        .withColumn("__exact", F.lit(True))
    )

    def _bands(df, idc):
        return df.select(
            idc,
            "sig",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.md5(
                                F.encode(
                                    F.concat_ws(
                                        "|", F.slice("sig", b * r + 1, r)
                                    ),
                                    "utf-8",
                                )
                            ).alias("band_hash"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bd"),
        ).select(idc, "sig", "bd.band_idx", "bd.band_hash")

    bband = _bands(bsig, batch_id_col)
    cband = _bands(csig, corpus_id_col).select(
        "band_idx", "band_hash", F.col("sig").alias("csig")
    )
    est = (
        F.size(
            F.filter(F.zip_with("sig", "csig", lambda a, b: a == b), lambda x: x)
        )
        / F.lit(float(k))
    )
    near = (
        bband.join(cband, ["band_idx", "band_hash"])
        .filter(est >= threshold)
        .select(batch_id_col)
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    return (
        bsig.select(batch_id_col)
        .join(exact, batch_id_col, "left")
        .join(near, batch_id_col, "left")
        .select(
            batch_id_col,
            F.when(F.col("__exact"), F.lit("exact_dup"))
            .when(F.col("__near"), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


def exact_jaccard_pairs_inverted(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    df_cap: int | None = 64,
) -> DataFrame:
    """EXACT shingle-Jaccard for every pair sharing >= 1 shingle, via
    an inverted index — the scale-correct ground truth for evaluating
    approximate dedup (minhash_lsh_pairs): explode shingles, self-join
    on the shingle key (only co-shingle pairs are ever materialized —
    a pair with Jaccard 0 never exists in the index), count the
    intersection, and recover the union as |A| + |B| − |A∩B|.

    Cost is Σ df(s)² over shingle document-frequencies — sub-quadratic
    on real corpora where almost all shingles are rare, but one
    boilerplate shingle shared by B docs costs B² pairs on exactly the
    hottest key (the 10x smoke's planted crawl banner measured 13.3x
    before the cap existed). `df_cap` drops shingles with document
    frequency above the cap from the VOCABULARY (both the index and
    the per-doc sizes), so the Jaccard is exact over the non-
    boilerplate shingle space — the same judgment minhash_lsh_pairs'
    band-bucket cap makes: overlap that ubiquitous is boilerplate
    evidence, not duplication evidence. Post-cap the 10x ratio is
    near-linear.
    """
    sh0 = df.select(
        F.col(id_col).alias("doc_id"),
        shingles(text_col, shingle_n).alias("sh"),
    )
    return exact_jaccard_pairs_inverted_from_shingles(
        sh0, sh_col="sh", id_col="doc_id", df_cap=df_cap
    )


def exact_jaccard_pairs_inverted_from_shingles(
    sh_df: DataFrame,
    sh_col: str = "sh",
    id_col: str = "doc_id",
    df_cap: int | None = 64,
) -> DataFrame:
    """exact_jaccard_pairs_inverted from an ALREADY-COMPUTED shingle
    frame `(id_col, sh_col)` — callers that run both the exact ground
    truth and an approximate candidate stage over the same corpus
    (minhash_lsh_recall_eval) pin ONE shingle frame and feed it to
    both, so the corpus mutation + shingle transform run once per
    invocation instead of once per stage (optimization r11)."""
    sh0 = sh_df.select(
        F.col(id_col).alias("doc_id"), F.col(sh_col).alias("sh")
    ).filter(F.size("sh") > 0)
    # df-cap as ONE window count over the s exchange instead of
    # groupBy(s) + join-back: the old shape shuffled the full exploded
    # index by s twice (count pass + cap semi-join) and pinned two
    # frames; count(*) over (partition by s) filters in place on a
    # single s exchange — same rows out (optimization r11, guide §2.4).
    # The surviving frame is pinned once per invocation: it feeds the
    # sizes pass AND both self-join sides — unpinned, the shingle
    # computation re-runs on every branch.
    tok = sh0.select("doc_id", F.explode("sh").alias("s"))
    if df_cap is not None:
        tok = (
            tok.withColumn(
                "__df", F.count(F.lit(1)).over(Window.partitionBy("s"))
            )
            .filter(F.col("__df") <= df_cap)
            .drop("__df")
        )
    tok = tok.localCheckpoint(eager=False)
    sh = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    l, r = tok.alias("l"), tok.alias("r")
    inter = (
        l.join(
            r,
            on=[
                F.col("l.s") == F.col("r.s"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_id_1"),
            F.col("r.doc_id").alias("doc_id_2"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    n1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("n_sh").alias("__n1"))
    n2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("n_sh").alias("__n2"))
    return (
        inter.join(n1, "doc_id_1")
        .join(n2, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            (
                F.col("n_inter").cast("double")
                / (F.col("__n1") + F.col("__n2") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def capped_band_pairs(
    fp: DataFrame,
    band_cols: tuple[str, ...],
    cap: int,
    id_col: str = "vid",
) -> DataFrame:
    """Pigeonhole candidate pairs from per-item band values, with the
    same boilerplate guard MinHash-LSH carries (`bucket_cap` above):
    for EACH band, buckets holding more than `cap` items are excluded
    from that band's equality join — a bucket that hot contributes
    B^2/2 pairs on exactly the hottest key (the quadratic blow-up a
    degenerate corpus plants), and its members still pair through
    their other bands.  The over-cap set is bounded by the band-value
    space (<= 256 keys for 8-bit bands), so it broadcasts as an
    anti-join; nothing corpus-sized is re-shuffled to enforce the cap.

    Output: (vid_1, vid_2, x0..x{k-1}, y0..y{k-1}) — both sides'
    band values, deduplicated across bands, vid_1 < vid_2.

    `fp` is pinned with one localCheckpoint (same policy as
    with_global_rank): the plan references it 3x per band — count,
    left, right — and fingerprint frames come from decode kernels
    whose recompute is the expensive part (unpinned, the audio query
    re-ran its Arrow decode 12x: 32 scans in the plan audit).
    """
    fp = fp.localCheckpoint(eager=False)
    x_names = [f"x{i}" for i in range(len(band_cols))]
    y_names = [f"y{i}" for i in range(len(band_cols))]
    out: DataFrame | None = None
    for col in band_cols:
        hot = (
            fp.groupBy(col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > cap)
            .select(col)
        )
        ok = fp.join(F.broadcast(hot), [col], "left_anti")
        a = ok.select(
            F.col(id_col).alias("vid_1"),
            *[F.col(c).alias(x) for c, x in zip(band_cols, x_names)],
            F.col(col).alias("__k"),
        )
        b = ok.select(
            F.col(id_col).alias("vid_2"),
            *[F.col(c).alias(y) for c, y in zip(band_cols, y_names)],
            F.col(col).alias("__k"),
        )
        j = (
            a.join(b, "__k")
            .filter(F.col("vid_1") < F.col("vid_2"))
            .drop("__k")
        )
        out = j if out is None else out.unionAll(j)
    assert out is not None
    return out.distinct()
