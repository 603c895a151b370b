"""stream_sliding_windows emits exactly the closed-window rows its
oracle-checked batch twin computes — hopping-window append semantics
anchored to the DuckDB oracle transitively."""

from __future__ import annotations

from stockpulse_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _key(r):
    return (r["window_start"], r["window_end"], r["event_type"])


def test_sliding_stream_equals_batch_twin(spark):
    stream_rows = (
        REGISTRY["stream_sliding_windows"].builder(spark, SF_DIR).collect()
    )
    batch_rows = (
        REGISTRY["sliding_windows_batch"].builder(spark, SF_DIR).collect()
    )
    s = {_key(r): (r["n_events"], r["total_value"]) for r in stream_rows}
    b = {_key(r): (r["n_events"], r["total_value"]) for r in batch_rows}
    assert len(s) == len(stream_rows)  # keys unique — appended exactly once
    assert s == b


def test_dedup_within_watermark_key_set(spark):
    stream_rows = (
        REGISTRY["stream_dedup_within_watermark"]
        .builder(spark, SF_DIR)
        .collect()
    )
    batch_rows = REGISTRY["dedup_keys_batch"].builder(spark, SF_DIR).collect()
    s = {(r["user_id"], r["ts"]) for r in stream_rows}
    assert len(s) == len(stream_rows)  # each key emitted exactly once
    assert s == {(r["user_id"], r["ts"]) for r in batch_rows}
