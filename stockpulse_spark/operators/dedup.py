"""Deduplication operators (reference parity: W1 / A2 / A4 / T2).

The reference needs THREE dedup layers because its sink is append-only
and its checks are per-record RPCs (fetch gate stocks_pipeline.py:109-121,
per-message EXISTS bigquery_loader.py:118-140, periodic ROW_NUMBER
rewrite dedup_pipeline.py:24-111). In Spark the same guarantee is one
shuffle: a keyed window or `dropDuplicates`, and under streaming
`withWatermark + dropDuplicates` with bounded state.

Scale notes:
- `dedup_keep_latest` is one hash-shuffle on the key columns; with
  storage bucketed by the key it becomes shuffle-free.
- prefer `dropDuplicatesWithinWatermark` semantics in streams so state
  doesn't grow unboundedly (see streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Keep exactly one row per key, preferring the greatest order_cols.

    Reference: ROW_NUMBER() OVER (PARTITION BY symbol,timestamp ORDER BY
    timestamp DESC) + rn=1 (src/preprocessing/dedup_pipeline.py:31-53).
    One window shuffle; Catalyst plans it as a single hash exchange.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_report(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys occurring more than once, worst first.

    Reference diagnostic: GROUP BY timestamp,symbol HAVING COUNT(*)>1
    ORDER BY count DESC (docs/duplicates_in_bigquery.md:6-19).
    Map-side partial aggregation makes this cheap even on skewed keys.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("duplicate_count"))
        .filter(F.col("duplicate_count") > 1)
        .orderBy(F.col("duplicate_count").desc(), *keys)
    )


def min_label_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation —
    the transitive closure a dedup keeper assignment needs when
    near-dup evidence chains (A~B from one blocking key, B~C from
    another, A⁄~C directly: all three are one group, one keeper).

    Each iteration: label(v) ← min over labels of N(v) ∪ {v} — the
    self-loop edges fold the "keep own label" term into the neighbor
    min, so a round is ONE join + ONE partial-agg shuffle with no
    rejoin of the previous labels (optimization r12; the earlier shape
    left-joined labels back against the neighbor minima every round).
    Convergence is detected from the (strictly decreasing) sum of
    labels, computed by the SAME action that materializes the round's
    lazily-checkpointed labels — one Spark job per round, half the
    per-round fixed cost of the old eager-checkpoint-then-aggregate
    pair (optimization r12; the loop is round-trip-bound at small SF).
    GraphX/GraphFrames implement exactly this loop; re-expressed here
    on DataFrames to stay dependency-free.

    Returns (id_col, label): label = min vertex id of the component.
    """
    # materialize the symmetric edge set ONCE per invocation (lazy
    # localCheckpoint, materialized by the first round's action):
    # without it every propagation round re-executes the whole edge-
    # producing pipeline upstream (for the LSH keeper queries that is
    # the full bucket + pair + cosine cascade — measured 3x the query's
    # own cost at sf0.1, and unboundedly worse at scale)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if vertices is None:
        verts = sym.select(F.col("a").alias(id_col)).distinct()
    else:
        verts = vertices.select(id_col).distinct()
    # self-loops: min over N(v) ∪ {v} ≡ least(own label, neighbor min),
    # because labels are monotone non-increasing and start at the id
    selfed = sym.union(
        verts.select(F.col(id_col).alias("a"), F.col(id_col).alias("b"))
    ).localCheckpoint(eager=False)
    # identity-label sum — the convergence metric's starting point;
    # this one action also materializes the sym checkpoint (verts is
    # derived from it), so the upstream edge pipeline runs exactly once
    prev = verts.agg(F.sum(id_col)).first()[0]
    labels = verts.select(id_col, F.col(id_col).alias("label"))
    for _ in range(max_iter):
        labels = (
            selfed.join(labels.select(F.col(id_col).alias("b"), "label"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("a", id_col)
            .localCheckpoint(eager=False)
        )
        # ONE action: materializes this round's checkpoint AND computes
        # the convergence metric (guide §1 — fixed per-job cost was the
        # dominant term in this loop at bench scale)
        cur = labels.agg(F.sum("label")).first()[0]
        if cur == prev:
            return labels
        prev = cur
    # A graph that hasn't converged in max_iter rounds has a component
    # whose diameter exceeds the cap — silent wrong labels would merge
    # or split dedup groups undetectably, so fail loudly and point the
    # caller at the logarithmic-round algorithm.
    raise ValueError(
        f"min_label_components: not converged after {max_iter} rounds "
        "(component diameter exceeds the iteration cap); use "
        "star_components, which converges in O(log^2 n) rounds on any "
        "graph shape"
    )


def star_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the 100 TB-safe transitive closure: O(log² n) rounds on
    ANY graph shape, including the pathological million-node chain
    that plain min-label propagation (O(diameter) rounds) can never
    finish under a bounded iteration cap.

    Each round is two edge rewrites, each one join + one partial-agg
    shuffle over (node, node) pairs only:

    - large-star(u): hook every neighbor v > u onto
      m = min(N(u) ∪ {u});
    - small-star(u): hook every neighbor v ≤ u, and u itself, onto m.

    Edges stay symmetric + deduped between phases; lineage is cut with
    localCheckpoint per round and convergence is detected by an
    order-insensitive xxhash64 fingerprint of the canonical
    (min, max) edge set, computed by the same action that materializes
    the round. On convergence the edge set is a star forest and
    label(u) = min(u, min neighbor). Raises after max_iter (30 rounds
    covers any n that fits in 64-bit ids) rather than return wrong
    labels.

    Returns (id_col, label), label = min vertex id of the component;
    vertices absent from any edge label themselves.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # lazy: the first fingerprint action below materializes it —
        # one job instead of an eager-checkpoint + fingerprint pair
        # (optimization r12, same fuse as min_label_components)
        .localCheckpoint(eager=False)
    )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        mins = (
            e.union(e.select(F.col("a"), F.col("a").alias("b")))
            .groupBy("a")
            .agg(F.min("b").alias("m"))
        )
        # large-star(u) emits (v, m) for neighbors v > u; small-star(u)
        # emits (v, m) for neighbors v <= u plus the center edge (u, m).
        # Every undirected edge is processed from exactly one center
        # (the smaller endpoint for large, the larger for small), which
        # is what makes each phase one join + one agg, no blow-up.
        side = F.col("b") > F.col("a") if large else F.col("b") <= F.col("a")
        hooked = (
            e.join(mins, "a")
            .filter(side)
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        out = hooked if large else hooked.union(
            mins.select(F.col("a"), F.col("m").alias("b"))
        )
        return (
            out.union(out.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _fingerprint(e: DataFrame):
        canon = e.select(
            F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
        ).distinct()
        # decimal sum: a long sum of xxhash64 values overflows under
        # ANSI mode on all but tiny edge sets
        return canon.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("x", "y").cast("decimal(38,0)")),
        ).first()

    prev = _fingerprint(sym)
    converged = False
    for _ in range(max_iter):
        # lazy checkpoint + fingerprint = ONE action per round: the
        # fingerprint both materializes the round's edge set and
        # computes the convergence metric (optimization r12)
        sym = _star(_star(sym, large=True), large=False).localCheckpoint(
            eager=False
        )
        cur = _fingerprint(sym)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise ValueError(
            f"star_components: not converged after {max_iter} rounds"
        )
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(
            F.col("a").alias(id_col), F.least("a", "mb").alias("label")
        )
    )
    if vertices is not None:
        verts = vertices.select(id_col).distinct()
        labels = (
            verts.join(labels, id_col, "left")
            .select(id_col, F.coalesce("label", F.col(id_col)).alias("label"))
        )
    return labels


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    propagation_rounds: int = 8,
) -> DataFrame:
    """Adaptive connected components — the entry point dedup keeper
    assignment should use.

    Near-dup components are dense near-cliques (every member shares a
    blocking key with most others), so min-label propagation converges
    in 2-3 cheap rounds — run it first under a tight cap. If the graph
    hides a high-diameter component (the 100 TB pathological chain),
    the capped run raises instead of returning wrong labels, and the
    alternating large-star/small-star algorithm — O(log² n) rounds on
    any shape — finishes the job. Fast case pays nothing; adversarial
    case stays correct and bounded."""
    try:
        return min_label_components(
            edges, vertices, src, dst, id_col, max_iter=propagation_rounds
        )
    except ValueError:
        return star_components(edges, vertices, src, dst, id_col)


def new_keys_only(batch: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of `batch` whose key is absent from `existing`.

    Replaces the reference's per-record synchronous EXISTS lookup
    (src/loader/bigquery_loader.py:118-140) with ONE left-anti join —
    the idempotent-insert gate inside a foreachBatch sink. Spark
    broadcasts the smaller side automatically under AQE.
    """
    return batch.join(existing.select(*keys).distinct(), on=keys, how="left_anti")
