"""Stream == batch equality for the incrementally maintained weekly
rollup (the streaming half of the IVM contract that
`mergeable_weekly_rollup` proves for batch merges)."""

from __future__ import annotations

from stockpulse_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _key(r):
    return (str(r["week"]), r["event_type"])


def test_stream_weekly_rollup_equals_closed_batch(spark):
    stream_rows = (
        REGISTRY["stream_weekly_rollup"].builder(spark, SF_DIR).collect()
    )
    batch_rows = (
        REGISTRY["weekly_rollup_closed_batch"]
        .builder(spark, SF_DIR)
        .collect()
    )
    assert stream_rows, "stream emitted nothing — watermark never closed a week"
    s = {_key(r): r for r in stream_rows}
    b = {_key(r): r for r in batch_rows}
    assert s.keys() == b.keys()
    for k in s:
        for col in ("n", "avg_value", "var_value", "min_value", "max_value"):
            assert s[k][col] == b[k][col], (k, col, s[k][col], b[k][col])


def test_stream_weekly_rollup_excludes_open_week(spark):
    """The week containing max(ts) must NOT be sealed (its window end
    is past the final watermark)."""
    from stockpulse_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, SF_DIR, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    open_week = str(
        ev.select(
            F.date_trunc("week", F.max("ts")).cast("date").alias("w")
        ).first()["w"]
    )
    stream_rows = (
        REGISTRY["stream_weekly_rollup"].builder(spark, SF_DIR).collect()
    )
    assert all(str(r["week"]) != open_week for r in stream_rows), max_ts
