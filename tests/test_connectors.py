"""The connector seam: every binding must land on the same typed-row
contract, so downstream dedup/resample code never changes when the bus
does."""

from __future__ import annotations

import json
import tempfile
import uuid
from pathlib import Path

import pytest

from stockpulse_spark.sources.connectors import SOURCES, open_stream


def _run_to_memory(df, name: str, trigger: dict) -> list:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(**trigger)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    spark = df.sparkSession
    return spark.table(name).collect()


def test_file_binding_decodes_wire_messages(spark):
    src = tempfile.mkdtemp(prefix="sp_src_")
    bars = [
        {"timestamp": "2024-01-02 09:30:00", "symbol": "AAPL", "close": 101.5},
        {"timestamp": "2024-01-02 09:35:00", "symbol": "MSFT", "close": 402.0},
        {"timestamp": None, "symbol": None},  # malformed → dead-letter
    ]
    (Path(src) / "b0.json").write_text("\n".join(json.dumps(b) for b in bars))
    rows = _run_to_memory(
        open_stream(spark, "file", path=src),
        f"conn_file_{uuid.uuid4().hex[:8]}",
        {"availableNow": True},
    )
    ok = [r for r in rows if r["__ok"]]
    bad = [r for r in rows if not r["__ok"]]
    assert {(r["symbol"], r["close"]) for r in ok} == {("AAPL", 101.5), ("MSFT", 402.0)}
    assert all(r["timestamp"] is not None for r in ok)
    assert len(bad) == 1  # routed, not dropped — caller decides the dead-letter sink


def test_rate_binding_is_typed_and_bounded(spark):
    rows = _run_to_memory(
        open_stream(
            spark, "rate", rowsPerBatch=32, numPartitions=2, advanceMillisPerBatch=1000
        ),
        f"conn_rate_{uuid.uuid4().hex[:8]}",
        {"once": True},
    )
    assert rows
    assert all(r["__ok"] for r in rows)
    assert {r["symbol"] for r in rows} <= {"SYM0", "SYM1", "SYM2", "SYM3"}
    assert all(r["high"] >= r["close"] >= r["low"] for r in rows)


def test_kafka_binding_raises_actionable_guidance(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        open_stream(
            spark,
            "kafka",
            **{"kafka.bootstrap.servers": "broker:9092", "subscribe": "ticks"},
        )


def test_unknown_binding_rejected(spark):
    with pytest.raises(ValueError, match="unknown stream source"):
        open_stream(spark, "carrier-pigeon")


def test_bindings_registered():
    assert {"file", "rate", "kafka", "pubsublite"} <= set(SOURCES)
