"""End-to-end streaming soak: the reference's full lifecycle —
ingest → load (dedup, checkpointed) → maintenance (dedup rewrite +
compaction) → analytics — composed as ONE pipeline and driven through
three ingest cycles with query restarts between them, duplicate
redeliveries across restart boundaries, and a final equality check of
the analytics output against a batch twin computed from the expected
unique bars.

What each stage proves:
- restart recovery: the same checkpoint is reused across three
  separate StreamingQuery instances; files already processed are never
  re-read (T5) and the dropDuplicates state store survives restarts,
  so a bar redelivered in a LATER cycle is still dropped (T2);
- maintenance: the periodic keep-latest rewrite + file compaction the
  reference runs as dedup_pipeline.py, applied to the streamed raw
  archive (T7);
- analytics: the dashboard indicator panel (analytics_job) over the
  compacted table must be value-identical to the same plan over a
  directly-written batch of the unique bars — streamed-then-maintained
  and batch-loaded tables are interchangeable inputs.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from stockpulse_spark.jobs import analytics_job
from stockpulse_spark.operators.maintenance import compact, dedup_rewrite
from stockpulse_spark.streaming.pipeline import (
    dedup_stream,
    replay_json_stream,
    start_dual_sink,
)


def _bar(ts: str, symbol: str, close: float, volume: int = 10) -> dict:
    return dict(
        timestamp=ts, symbol=symbol, open=close - 1, high=close + 1,
        low=close - 2, close=close, volume=volume, date=ts[:10],
        time=ts[11:], moving_average=None, cumulative_average=None,
    )


def _mins(i: int) -> str:
    return f"2024-01-02 {9 + i // 12:02d}:{(i % 12) * 5:02d}:00"


def test_full_lifecycle_soak_with_restarts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    raw = str(tmp_path / "raw")
    proc = str(tmp_path / "proc")
    ckpt = str(tmp_path / "ckpt")

    def run_cycle(fname: str, bars: list[dict]) -> None:
        Path(src, fname).write_text("\n".join(json.dumps(b) for b in bars))
        stream = replay_json_stream(spark, str(src))
        q = start_dual_sink(dedup_stream(stream), raw, proc, ckpt)
        q.awaitTermination(120)

    mk = lambda i, s, off: _bar(_mins(i), s, 100.0 + i + off)  # noqa: E731
    cycle0 = [mk(i, s, o) for i in range(12) for s, o in (("AAPL", 0), ("MSFT", 50))]
    # cycle 1 redelivers two cycle-0 bars — the restarted query's state
    # store (not file tracking: these arrive in a NEW file) must drop them
    cycle1 = [mk(i, s, o) for i in range(12, 24) for s, o in (("AAPL", 0), ("MSFT", 50))]
    cycle1 += [mk(0, "AAPL", 0), mk(5, "MSFT", 50)]
    # cycle 2 redelivers a cycle-1 bar and adds fresh ones
    cycle2 = [mk(i, s, o) for i in range(24, 36) for s, o in (("AAPL", 0), ("MSFT", 50))]
    cycle2 += [mk(13, "AAPL", 0)]

    run_cycle("b0.json", cycle0)
    run_cycle("b1.json", cycle1)
    run_cycle("b2.json", cycle2)

    expected = [mk(i, s, o) for i in range(36) for s, o in (("AAPL", 0), ("MSFT", 50))]
    raw_df = spark.read.parquet(raw)
    assert raw_df.count() == len(expected), "cross-restart dedup failed"
    assert raw_df.select("symbol", "timestamp").distinct().count() == len(expected)

    # maintenance: keep-latest rewrite then compaction (reference T7)
    silver = str(tmp_path / "silver")
    dedup_rewrite(spark, raw, silver)
    n_files = compact(spark, silver)
    compacted = silver + "__compacted"
    assert n_files >= 1
    comp_df = spark.read.parquet(compacted)
    assert comp_df.count() == len(expected)

    # analytics over the streamed+maintained table == over a batch twin
    twin = str(tmp_path / "twin")
    (
        spark.createDataFrame(
            [
                (b["timestamp"], b["symbol"], b["open"], b["high"], b["low"],
                 b["close"], b["volume"])
                for b in expected
            ],
            "timestamp string, symbol string, open double, high double, "
            "low double, close double, volume long",
        )
        .withColumn("timestamp", F.to_timestamp("timestamp"))
        .write.partitionBy("symbol")
        .parquet(twin)
    )

    def panel(path: str) -> dict:
        rows = analytics_job(spark, path, symbol="AAPL").collect()
        return {
            r["timestamp"]: (
                r["close"], r["sma5"], r["bb_mid"], r["rsi14"], r["vwap"]
            )
            for r in rows
        }

    got, want = panel(compacted), panel(twin)
    assert set(got) == set(want)
    for ts in want:
        for a, b in zip(got[ts], want[ts]):
            assert (a is None) == (b is None)
            if a is not None:
                assert abs(a - b) < 1e-9, (ts, got[ts], want[ts])
