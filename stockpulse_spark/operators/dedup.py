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

    Each iteration: label(v) ← min(label(v), min over neighbors'
    labels) — one join + one partial-agg shuffle — and converges in
    O(component diameter) rounds, which for near-dup clusters is small
    (clusters are dense; chains are short). Every round
    `localCheckpoint`s the labels so lineage stays bounded, and
    convergence is detected from the (strictly decreasing) sum of
    labels, a metric computed by the same action that materializes the
    checkpoint epoch. GraphX/GraphFrames implement exactly this loop;
    re-expressed here on DataFrames to stay dependency-free.

    Returns (id_col, label): label = min vertex id of the component.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    if vertices is None:
        verts = sym.select(F.col("a").alias(id_col)).distinct()
    else:
        verts = vertices.select(id_col).distinct()
    labels = verts.select(id_col, F.col(id_col).alias("label")).localCheckpoint()
    prev = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col(id_col).alias("b"), "label"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("a", id_col)
        )
        labels = (
            labels.join(nbr_min, id_col, "left")
            .select(
                id_col,
                F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        cur = labels.agg(F.sum("label")).first()[0]
        if cur == prev:
            break
        prev = cur
    return labels


def new_keys_only(batch: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of `batch` whose key is absent from `existing`.

    Replaces the reference's per-record synchronous EXISTS lookup
    (src/loader/bigquery_loader.py:118-140) with ONE left-anti join —
    the idempotent-insert gate inside a foreachBatch sink. Spark
    broadcasts the smaller side automatically under AQE.
    """
    return batch.join(existing.select(*keys).distinct(), on=keys, how="left_anti")
