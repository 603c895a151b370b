"""Focused tests for the round-12 optimizations.

- footer-stat caches are (path, mtime)-keyed: an in-place rewrite of a
  table at the same path must serve FRESH statistics (r11 verdict item
  7 — the stale-footer hazard the width/bound planners would otherwise
  inherit).
- min_label_components / star_components keep their contracts through
  the fused-action rewrite (one job per round): planted chains still
  resolve transitively, every vertex is labeled, and the per-round
  job count is pinned so the optimization cannot silently regress.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(path: str, n: int) -> None:
    pq.write_table(
        pa.table({"v": pa.array(range(n), type=pa.int64())}), path
    )
    # force a distinct mtime even on coarse-resolution filesystems
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + n + 1))


def test_footer_caches_invalidate_on_inplace_rewrite(tmp_path):
    from stockpulse_spark.sources.tables import (
        footer_column_span,
        footer_row_count,
    )

    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "t.parquet")
    _write_events(path, 5)
    assert footer_row_count(sf_dir, "t") == 5
    assert footer_column_span(sf_dir, "t", "v") == (0, 4)
    _write_events(path, 7)  # same path, new contents
    assert footer_row_count(sf_dir, "t") == 7
    assert footer_column_span(sf_dir, "t", "v") == (0, 6)


def test_nanos_columns_cache_invalidates_on_inplace_rewrite(tmp_path):
    from stockpulse_spark.sources.tables import _nanos_ts_columns

    path = os.path.join(str(tmp_path), "t.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ns"))}), path
    )
    assert _nanos_ts_columns(path) == ("ts",)
    time.sleep(0.01)
    pq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.timestamp("us"))}), path
    )
    assert _nanos_ts_columns(path) == ()


@pytest.fixture(scope="module")
def spark():
    from stockpulse_spark.session import get_spark

    return get_spark("test_opt_r12")


def _planted_chain_edges(spark):
    # A-B-C chains: C learns its keeper only transitively through B
    return spark.createDataFrame(
        [(4, 5), (5, 6), (40, 41), (41, 42)], ["src", "dst"]
    )


def test_min_label_fused_rounds_still_transitive(spark):
    from stockpulse_spark.operators.dedup import min_label_components

    labels = {
        r["id"]: r["label"]
        for r in min_label_components(_planted_chain_edges(spark)).collect()
    }
    assert labels == {4: 4, 5: 4, 6: 4, 40: 40, 41: 40, 42: 40}


def test_min_label_labels_isolated_vertices(spark):
    from stockpulse_spark.operators.dedup import min_label_components

    verts = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    labels = {
        r["id"]: r["label"]
        for r in min_label_components(
            _planted_chain_edges(spark), vertices=verts
        ).collect()
    }
    # vertices absent from any edge label themselves
    for i in (0, 1, 2, 3, 7):
        assert labels[i] == i
    assert labels[4] == labels[5] == labels[6] == 4


def test_min_label_one_job_per_round(spark):
    """The r12 fuse: each propagation round is ONE py4j action (the
    convergence aggregate materializes the round's lazy checkpoint),
    and the per-round left-join of the previous labels is gone (the
    self-loop edges fold it into the neighbor min). Under AQE one
    action still spawns one job per query-stage materialization, so
    the pin is on TOTAL jobs: this fixture measured 31 jobs on the
    old eager-checkpoint/left-join shape and 22 on the fused shape —
    a midpoint bound catches a regression of either half."""
    from stockpulse_spark.operators.dedup import min_label_components

    min_label_components(_planted_chain_edges(spark)).collect()  # warm
    sc = spark.sparkContext
    group = "cc_job_probe"
    sc.setJobGroup(group, "cc probe")
    min_label_components(_planted_chain_edges(spark)).collect()
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert n_jobs <= 26, f"CC loop regressed to {n_jobs} jobs"


def test_star_components_fused_matches_min_label(spark):
    from stockpulse_spark.operators.dedup import (
        min_label_components,
        star_components,
    )

    edges = _planted_chain_edges(spark)
    a = {r["id"]: r["label"] for r in star_components(edges).collect()}
    b = {r["id"]: r["label"] for r in min_label_components(edges).collect()}
    assert a == b


def test_inrow_srp_bucket_matches_per_plane_form(spark):
    """The r12 in-row SRP bucket assembly (one interpreted fold per
    (vector, table) row) must be bit-identical to the per-plane
    reference form srp_bucket (sign of the same sequential dot fold,
    same ascending-j bit weights) on random vectors including zeros
    and exact-boundary components."""
    import random

    from pyspark.sql import functions as F

    from stockpulse_spark.functions.localrel import values_df
    from stockpulse_spark.llmdata.similarity import (
        pseudo_planes,
        srp_bucket,
    )

    rng = random.Random(12)
    dim, n_planes, n_tables = 16, 4, 3
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)
    ] + [(100, [0.0] * dim)]
    v = values_df(spark, rows, ["vec_id", "e"])
    ref = v.select(
        "vec_id",
        *[
            srp_bucket(F.col("e"), pseudo_planes(n_planes, dim, table=t))
            .cast("int")
            .alias(f"b{t}")
            for t in range(n_tables)
        ],
    )
    tbl = values_df(
        spark,
        [(t, pseudo_planes(n_planes, dim, table=t)) for t in range(n_tables)],
        ["tidx", "planes"],
    )
    bucket = F.expr(
        "CAST(aggregate(transform(planes, (p, j) -> CASE WHEN "
        "aggregate(zip_with(e, p, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x) > 0 THEN shiftleft(1, j) ELSE 0 END), "
        "0, (a, b) -> a + b) AS INT)"
    )
    inrow = (
        v.crossJoin(F.broadcast(tbl))
        .select("vec_id", "tidx", bucket.alias("bucket"))
        .groupBy("vec_id")
        .pivot("tidx", list(range(n_tables)))
        .sum("bucket")
    )
    a = {r["vec_id"]: [r[f"b{t}"] for t in range(n_tables)] for r in ref.collect()}
    b = {r["vec_id"]: [r[str(t)] for t in range(n_tables)] for r in inrow.collect()}
    assert a == b
