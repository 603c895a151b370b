"""stream_abandoned_views anchoring: timeout-driven emissions are
bracketed by the oracle-checked batch twin at the engine-reported
final watermark.

- every emitted row must be a genuinely abandoned view (subset of
  the twin) with matching view timestamp;
- every twin row whose deadline is STRICTLY before the final
  watermark must have emitted (the timeout fired);
- nothing at-or-past the frontier may emit early;
- at least one row must emit (non-vacuity: the timeout path ran).
"""

from __future__ import annotations

from datetime import datetime, timezone

from stockpulse_spark.plans import REGISTRY
from tests.conftest import SF_DIR

_T_US = 4 * 3600 * 1_000_000


def test_abandoned_views_stream_bracketed_by_twin(spark):
    out = (
        REGISTRY["stream_abandoned_views"].builder(spark, SF_DIR).collect()
    )
    wm_str = spark.conf.get("stockpulse.lastAbandonWatermark")
    assert wm_str, "no watermark reported — replay never ratcheted"
    wm_us = int(
        datetime.strptime(wm_str, "%Y-%m-%dT%H:%M:%S.%fZ")
        .replace(tzinfo=timezone.utc)
        .timestamp()
        * 1_000_000
    )

    emitted = {(r["user_id"], r["view_id"]): r["view_ts_us"] for r in out}
    assert len(emitted) == len(out)  # appended exactly once

    twin = {
        (r["user_id"], r["view_id"]): r["view_ts_us"]
        for r in REGISTRY["abandoned_views_batch"]
        .builder(spark, SF_DIR)
        .collect()
    }

    # subset with matching timestamps
    for k, ts in emitted.items():
        assert k in twin and twin[k] == ts, k

    must_fire = {
        k for k, ts in twin.items() if ts + _T_US < wm_us
    }
    may_fire = {
        k for k, ts in twin.items() if ts + _T_US <= wm_us
    }
    assert must_fire <= set(emitted)
    assert set(emitted) <= may_fire
    assert len(emitted) > 0, "timeout path never exercised"
