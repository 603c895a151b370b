"""Stateful streaming EMA: state must carry across micro-batches so
the streaming result equals the batch ewm over the full history."""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pytest

from stockpulse_spark.streaming.pipeline import replay_json_stream
from stockpulse_spark.streaming.stateful import streaming_ema


def _bar(ts: str, symbol: str, close: float) -> dict:
    return dict(
        timestamp=ts, symbol=symbol, open=close, high=close, low=close,
        close=close, volume=1, date=ts[:10], time=ts[11:],
        moving_average=None, cumulative_average=None,
    )


def test_streaming_ema_resumes_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    closes = [100.0, 101.0, 103.0, 99.0, 98.5, 102.0]
    bars = [
        _bar(f"2024-01-02 09:{30 + 5 * i:02d}:00", "AAPL", c)
        for i, c in enumerate(closes)
    ]

    def run(upto_file: int) -> None:
        stream = replay_json_stream(spark, str(src))
        ema = streaming_ema(stream.select("symbol", "timestamp", "close"), span=3)
        q = (
            ema.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: first 3 bars; batch 2 (restart from checkpoint): last 3
    Path(src, "b0.json").write_text("\n".join(json.dumps(b) for b in bars[:3]))
    run(0)
    Path(src, "b1.json").write_text("\n".join(json.dumps(b) for b in bars[3:]))
    run(1)

    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .orderBy("timestamp")
        .toPandas()["ema"]
        .tolist()
    )
    expected = pd.Series(closes).ewm(span=3, adjust=False).mean().tolist()
    assert got == pytest.approx(expected, rel=1e-12), (
        "streaming EMA must equal batch ewm over the concatenated history"
    )
