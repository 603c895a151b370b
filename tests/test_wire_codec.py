"""Wire-codec (S7/S8) round-trip, dead-letter routing, incremental
gate, catalog DDL, and watermark late-drop (T3) tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stockpulse_spark.sources.rest_replay import incremental_gate
from stockpulse_spark.sources.sinks import ensure_tables
from stockpulse_spark.streaming.pipeline import (
    decode_stream_messages,
    encode_stream_messages,
)


@pytest.fixture()
def bars(spark):
    rows = [
        ("2024-01-02 09:30:00", "AAPL", 10.0, 12.0, 9.0, 11.0, 100),
        ("2024-01-02 09:35:00", "MSFT", 11.0, 13.0, 10.0, 12.0, 200),
    ]
    return spark.createDataFrame(
        rows,
        "timestamp string, symbol string, open double, high double, low double, close double, volume long",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))


def test_wire_roundtrip(spark, bars):
    encoded = encode_stream_messages(bars)
    msgs = [r["value"] for r in encoded.collect()]
    assert all(json.loads(m)["symbol"] in ("AAPL", "MSFT") for m in msgs)
    decoded = decode_stream_messages(encoded)
    back = decoded.filter("__ok").select(
        "timestamp", "symbol", "open", "high", "low", "close", "volume"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, bars.collect()))


def test_dead_letter_routing(spark):
    raw = spark.createDataFrame([("{not json",), ('{"symbol": "AAPL"}',)], "value string")
    out = decode_stream_messages(raw)
    ok = out.filter("__ok").collect()
    dead = out.filter("NOT __ok").collect()
    assert len(ok) == 1 and ok[0]["symbol"] == "AAPL"
    assert len(dead) == 1 and dead[0]["value"] == "{not json"


def test_incremental_gate(spark, bars):
    last_seen = spark.createDataFrame(
        [("AAPL", "2024-01-02 09:30:00")], "symbol string, max_ts string"
    ).withColumn("max_ts", F.to_timestamp("max_ts"))
    out = incremental_gate(bars, last_seen, retention_days=100000)
    got = [(r["symbol"], str(r["timestamp"])) for r in out.collect()]
    # AAPL 09:30 is NOT newer than stored max → dropped; MSFT unseen → kept
    assert got == [("MSFT", "2024-01-02 09:35:00")]


def test_ensure_tables_idempotent(spark):
    ensure_tables(spark, db="sp_test")
    ensure_tables(spark, db="sp_test")  # second run must not raise
    tables = {t.name for t in spark.catalog.listTables("sp_test")}
    assert {"bars_raw", "bars_processed"} <= tables
    schema = spark.table("sp_test.bars_processed").schema
    assert "moving_average" in schema.fieldNames()


def test_watermark_drops_late_rows(spark, tmp_path):
    """T3: with a 10-minute watermark, a row older than
    (max_seen - watermark) arriving in a LATER batch is dropped by the
    stateful dedup operator."""
    import json as _json
    from pathlib import Path

    from stockpulse_spark.streaming.pipeline import (
        dedup_stream,
        replay_json_stream,
        start_dual_sink,
    )

    src = tmp_path / "src"
    src.mkdir()

    def bar(ts):
        return dict(
            timestamp=ts, symbol="AAPL", open=1.0, high=2.0, low=0.5,
            close=1.5, volume=10, date=ts[:10], time=ts[11:],
            moving_average=None, cumulative_average=None,
        )

    # batch 0 advances the watermark to 12:00 - 10min = 11:50
    Path(src, "b0.json").write_text(
        "\n".join(_json.dumps(bar(t)) for t in
                  ["2024-01-02 11:00:00", "2024-01-02 12:00:00"])
    )
    stream = replay_json_stream(spark, str(src), max_files_per_trigger=1)
    deduped = dedup_stream(stream, watermark="10 minutes")
    q = start_dual_sink(
        deduped, str(tmp_path / "raw"), str(tmp_path / "proc"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    # batch 1: one too-late row (11:30 < watermark) + one fresh row
    Path(src, "b1.json").write_text(
        "\n".join(_json.dumps(bar(t)) for t in
                  ["2024-01-02 11:30:00", "2024-01-02 12:05:00"])
    )
    stream2 = replay_json_stream(spark, str(src), max_files_per_trigger=1)
    q2 = start_dual_sink(
        dedup_stream(stream2, watermark="10 minutes"),
        str(tmp_path / "raw"), str(tmp_path / "proc"), str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    got = sorted(
        str(r["timestamp"]) for r in spark.read.parquet(str(tmp_path / "raw")).collect()
    )
    assert "2024-01-02 11:30:00" not in got  # late row dropped
    assert "2024-01-02 12:05:00" in got
