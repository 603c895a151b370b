"""stream_enriched_segment_counts emits exactly the closed-window rows
its oracle-checked batch twin computes — stream-static broadcast
enrichment anchored to the DuckDB oracle transitively."""

from __future__ import annotations

from stockpulse_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _key(r):
    return (r["window_start"], r["window_end"], r["c_mktsegment"])


def test_enriched_stream_equals_batch_twin(spark):
    stream_rows = (
        REGISTRY["stream_enriched_segment_counts"]
        .builder(spark, SF_DIR)
        .collect()
    )
    batch_rows = (
        REGISTRY["enriched_segment_counts_batch"]
        .builder(spark, SF_DIR)
        .collect()
    )
    s = {_key(r): (r["n_events"], r["total_value"]) for r in stream_rows}
    b = {_key(r): (r["n_events"], r["total_value"]) for r in batch_rows}
    assert len(s) == len(stream_rows)  # appended exactly once per key
    assert s == b
