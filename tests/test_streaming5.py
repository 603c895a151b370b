"""stream_attribution_outer anchoring: both halves of the outer
stream-stream join tie back to DuckDB-oracle-checked batch twins.

- matched rows (click_id NOT NULL) == purchase_attribution_batch,
  row for row: inner-join semantics are unchanged by the outer mode.
- null-padded rows (click_id NULL) == unattributed_purchases
  restricted to purchases STRICTLY older than the final watermark the
  engine reported — eviction is the only part batch SQL cannot
  express, so the frontier comes from the query's own progress
  metrics, not a re-derivation.
- at least one null-padded row must emit (the 8-chunk replay gives
  the watermark 8 chances to ratchet; a zero here would mean the
  deferred-emission path was never exercised and the test is
  vacuous).
"""

from __future__ import annotations

from datetime import datetime, timezone

from stockpulse_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_outer_stream_anchors_to_batch_twins(spark):
    out = (
        REGISTRY["stream_attribution_outer"].builder(spark, SF_DIR).collect()
    )
    wm_str = spark.conf.get("stockpulse.lastOuterWatermark")
    assert wm_str, "no watermark reported — replay never ratcheted"
    wm = datetime.strptime(
        wm_str, "%Y-%m-%dT%H:%M:%S.%fZ"
    ).replace(tzinfo=None)

    matched = {
        (r["purchase_id"], r["click_id"]): (
            r["latency_us"],
            r["purchase_value"],
        )
        for r in out
        if r["click_id"] is not None
    }
    nulls = {r["purchase_id"] for r in out if r["click_id"] is None}

    batch = (
        REGISTRY["purchase_attribution_batch"].builder(spark, SF_DIR).collect()
    )
    want_matched = {
        (r["purchase_id"], r["click_id"]): (
            r["latency_us"],
            r["purchase_value"],
        )
        for r in batch
    }
    assert matched == want_matched

    unattr = (
        REGISTRY["unattributed_purchases"].builder(spark, SF_DIR).collect()
    )
    # map purchase_id -> ts for the frontier filter
    from stockpulse_spark.sources.tables import load_table

    ts_by_id = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, SF_DIR, "events")
        .filter("event_type = 'purchase'")
        .select("event_id", "ts")
        .collect()
    }
    want_nulls = {
        r["purchase_id"]
        for r in unattr
        if ts_by_id[r["purchase_id"]] < wm
    }
    assert nulls == want_nulls
    assert len(nulls) > 0, "deferred-emission path never exercised"
