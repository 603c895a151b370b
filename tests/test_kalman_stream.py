"""Streaming Kalman filter == batch twin, under any micro-batch
split — the state-space analog of the up-streak stateful-operator
tests (same harness shape)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from stockpulse_spark.plans import REGISTRY
from stockpulse_spark.sources.tables import load_table
from stockpulse_spark.streaming.transform_state import (
    _kalman_fold,
    running_kalman_filter,
)
from tests.conftest import SF_DIR


def test_kalman_kernel_matches_closed_form():
    # single observation initializes state exactly
    n, l, p = _kalman_fold([7.5], 0, None, None)
    assert (n, l, p) == (1, 7.5, 1.0)
    # second step: ppred = 1.1, k = 1.1/2.1
    n, l, p = _kalman_fold([10.0], n, l, p)
    k = 1.1 / 2.1
    assert n == 2
    assert l == 7.5 + k * (10.0 - 7.5)
    assert p == (1.0 - k) * 1.1


@pytest.mark.parametrize("chunks", [1, 3, 7])
def test_kalman_kernel_split_invariant(chunks):
    vals = [5.0, 6.5, 4.2, 8.8, 7.7, 9.9, 3.3, 5.5, 6.6, 7.0]
    whole = _kalman_fold(vals, 0, None, None)
    state = (0, None, None)
    size = max(1, len(vals) // chunks)
    for i in range(0, len(vals), size):
        state = _kalman_fold(vals[i : i + size], *state)
    assert state == whole  # bit-for-bit, not approximately


def _run_kalman_stream(spark, src_dir, max_files=None, glob_filter="events.parquet"):
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
    out = running_kalman_filter(stream.select("user_id", "ts", "value"))
    name = f"kal_{abs(hash((src_dir, max_files))) % 10**8}"
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
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_obs"] > cur["n_obs"]:
            final[r["user_id"]] = r
    return final


def test_kalman_stream_equals_batch_twin(spark):
    load_table(spark, SF_DIR, "events")
    final = _run_kalman_stream(spark, SF_DIR)
    batch = {
        r["user_id"]: r
        for r in REGISTRY["kalman_events_batch"].builder(spark, SF_DIR).collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s["n_obs"] == b["n_obs"]
        assert round(s["level"] * 1e6) / 1e6 == b["level"], uid
        assert round(s["err_var"] * 1e6) / 1e6 == b["err_var"], uid


def test_kalman_stream_split_matches_batch(spark, tmp_path):
    """Two micro-batches (time-ordered files) fold to the identical
    final state as the batch query — checkpointed keyed state carries
    (n, l, p) across the restart boundary of the trigger."""
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
        os.utime(dst, (now + i * 1000, now + i * 1000))

    final_two = _run_kalman_stream(
        spark, base, max_files=1, glob_filter="e*.parquet"
    )
    batch = {
        r["user_id"]: r
        for r in REGISTRY["kalman_events_batch"].builder(spark, SF_DIR).collect()
    }
    assert set(final_two) == set(batch)
    bad = [
        uid
        for uid, b in batch.items()
        if final_two[uid]["n_obs"] != b["n_obs"]
        or round(final_two[uid]["level"] * 1e6) / 1e6 != b["level"]
    ]
    assert not bad, bad[:5]
