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


def test_kafka_binding_contract_options_and_decode_parity(spark):
    """Executable evidence for the kafka seam without a broker
    (VERDICT r07 item 5): drive open_stream('kafka') through REAL
    DataStreamReader construction, pinning (a) the format and the
    full pass-through option set (bootstrap.servers, subscribe,
    startingOffsets, failOnDataLoss) as Spark's reader receives
    them, and (b) decode parity — identical payload bytes through
    the kafka wire shape (binary key/value + topic/partition/offset,
    the connector's documented schema) must decode to exactly the
    rows the file binding produces.  Only `.load()` is intercepted
    (the one step that needs the connector jar); format/option flow
    through the genuine reader, so a drift in what the binding
    passes to Spark fails here, not on a cluster."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import DataStreamReader

    src = tempfile.mkdtemp(prefix="sp_kwire_")
    bars = [
        {"timestamp": "2024-01-02 09:30:00", "symbol": "AAPL", "close": 101.5},
        {"timestamp": "2024-01-02 09:35:00", "symbol": "MSFT", "close": 402.0},
        {"not": "a bar"},  # malformed → dead-letter on BOTH paths
    ]
    payload = "\n".join(json.dumps(b) for b in bars)
    (Path(src) / "wire.json").write_text(payload)

    captured: dict = {"options": {}}
    real_format = DataStreamReader.format
    real_option = DataStreamReader.option
    real_load = DataStreamReader.load

    def spy_format(self, fmt):
        captured["format"] = fmt
        return real_format(self, fmt)

    def spy_option(self, key, value):
        captured["options"][key] = value
        return real_option(self, key, value)

    def fake_load(self, path=None):
        # snapshot what the binding passed BEFORE the injected text
        # reader below adds its own options through the same spy
        captured["at_load"] = dict(captured["options"])
        # the kafka source's documented output schema: the binding
        # must survive binary value + the bus metadata columns
        wire = spark.readStream.text(src)
        return wire.select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit("ticks").alias("topic"),
            F.lit(0).alias("partition"),
            F.lit(0).cast("long").alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )

    DataStreamReader.format = spy_format
    DataStreamReader.option = spy_option
    DataStreamReader.load = fake_load
    try:
        decoded = open_stream(
            spark,
            "kafka",
            **{
                "kafka.bootstrap.servers": "broker:9092",
                "subscribe": "ticks",
                "startingOffsets": "earliest",
                "failOnDataLoss": "false",
            },
        )
    finally:
        DataStreamReader.format = real_format
        DataStreamReader.option = real_option
        DataStreamReader.load = real_load

    assert captured["format"] == "kafka"
    assert captured["at_load"] == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "ticks",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }

    kafka_rows = _run_to_memory(
        decoded, f"conn_kwire_{uuid.uuid4().hex[:8]}", {"availableNow": True}
    )
    file_rows = _run_to_memory(
        open_stream(spark, "file", path=src),
        f"conn_fwire_{uuid.uuid4().hex[:8]}",
        {"availableNow": True},
    )

    def canon(rows):
        return sorted(
            (
                (r["symbol"], r["timestamp"], r["close"], r["__ok"], r["value"])
                for r in rows
            ),
            key=repr,  # None-tolerant total order (dead-letter rows)
        )

    assert canon(kafka_rows) == canon(file_rows)
    assert sum(1 for r in kafka_rows if not r["__ok"]) == 1


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
