"""The custom stateful streak operator (streaming/transform_state.py):
fold-kernel unit tests, stream == batch-twin equality, and the
cross-batch invariant — replaying the same data as one micro-batch or
two yields the same final state."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from pyspark.sql import functions as F

from stockpulse_spark.plans import REGISTRY
from stockpulse_spark.sources.tables import load_table
from stockpulse_spark.streaming.transform_state import (
    _fold_batch,
    running_series_stats,
)
from tests.conftest import SF_DIR


def _fold_series(vals, chunks=1):
    """Run the kernel over `vals` split into `chunks` batches."""
    state = (None, 0, 0)  # last_value, cur, best
    n = len(vals)
    size = (n + chunks - 1) // chunks
    for i in range(0, n, size):
        part = pd.Series(vals[i : i + size], dtype=float)
        cur, best = _fold_batch(part, state[0], state[1], state[2])
        last = float(part.iloc[-1]) if len(part) else state[0]
        state = (last, cur, best)
    return state[2]


def test_fold_kernel_basics():
    assert _fold_series([1, 2, 3, 2, 3, 4, 5, 1]) == 3
    assert _fold_series([5, 4, 3, 2, 1]) == 0
    assert _fold_series([1, 2, 3, 4]) == 3
    assert _fold_series([2, 2, 2]) == 0  # equal is not "up"
    assert _fold_series([1]) == 0


@pytest.mark.parametrize("chunks", [2, 3, 5])
def test_fold_kernel_batch_split_invariant(chunks):
    vals = [1, 3, 2, 4, 5, 6, 1, 2, 3, 4, 5, 0, 1]
    assert _fold_series(vals, chunks=chunks) == _fold_series(vals)


def _run_stream(spark, src_dir, max_files=None, glob_filter="events.parquet"):
    raw_schema = spark.read.option("pathGlobFilter", glob_filter).parquet(
        src_dir
    ).schema
    reader = spark.readStream.schema(raw_schema).format("parquet").option(
        "pathGlobFilter", glob_filter
    )
    if max_files:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    stream = reader.load(src_dir)
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    out = running_series_stats(stream.select("user_id", "ts", "value"))
    name = f"tws_{abs(hash((src_dir, max_files))) % 10**8}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    assert q.awaitTermination(300)
    rows = spark.table(name).collect()
    # final state per user = the row with the largest n_events
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    return final


def test_stream_equals_batch_twin(spark):
    load_table(spark, SF_DIR, "events")
    final = _run_stream(spark, SF_DIR)
    batch = {
        r["user_id"]: r
        for r in REGISTRY["up_streak_batch"].builder(spark, SF_DIR).collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s["n_events"] == b["n_events"]
        assert s["max_value"] == b["max_value"]
        assert s["best_up_streak"] == b["best_up_streak"], uid


def test_cross_batch_state_matches_single_batch(spark, tmp_path):
    """Split events into two time-ordered files; two micro-batches must
    fold to the same final state as one."""
    import glob
    import shutil

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")
    cut = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")).first()[0]
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    base = str(tmp_path / "events.parquet")
    os.makedirs(base)
    halves = (
        ("e0.parquet", ev.filter(F.col("ts").cast("double") <= cut)),
        ("e1.parquet", ev.filter(F.col("ts").cast("double") > cut)),
    )
    now = 1_700_000_000
    for i, (fname, half) in enumerate(halves):
        stage = str(tmp_path / f"stage{i}")
        half.coalesce(1).write.mode("overwrite").parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(base, fname)
        shutil.copy(part, dst)
        # order file-stream discovery: e0 strictly older than e1
        os.utime(dst, (now + i * 1000, now + i * 1000))

    final_two = _run_stream(spark, base, max_files=1, glob_filter="e*.parquet")
    batch = {
        r["user_id"]: r
        for r in REGISTRY["up_streak_batch"].builder(spark, SF_DIR).collect()
    }
    assert set(final_two) == set(batch)
    mismatches = [
        uid
        for uid, b in batch.items()
        if final_two[uid]["best_up_streak"] != b["best_up_streak"]
        or final_two[uid]["n_events"] != b["n_events"]
    ]
    assert not mismatches, mismatches[:5]


def test_active_binding_is_named_and_in_plan(spark, capsys):
    """Pin WHICH state API this runtime's evidence covers: the probe's
    answer must match the node that actually appears in the streaming
    plan, and the name is printed so the test log names the active
    path. Both bindings share the fold kernel; when the protobuf
    runtime is present the typed transformWithState path binds (and
    the cross-batch tests above run against it), otherwise
    applyInPandasWithState does."""
    from stockpulse_spark.streaming.transform_state import (
        active_state_binding,
        has_transform_with_state_runtime,
    )

    binding = active_state_binding()
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            (F.col("value") % 3).alias("user_id"),
            F.col("timestamp").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
    )
    out = running_series_stats(src)
    plan = out._jdf.queryExecution().logical().toString()
    if has_transform_with_state_runtime():
        assert binding == "transformWithStateInPandas"
        assert "TransformWithStateInPySpark" in plan or "TransformWithState" in plan
    else:
        assert binding == "applyInPandasWithState"
        assert "FlatMapGroupsInPandasWithState" in plan, plan
    with capsys.disabled():
        print(f"\n[transform_state] active state binding: {binding}")
