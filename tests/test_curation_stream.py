"""Ingest-time curation gate (streaming/curation.py): the dedup
admission gate runs inside a foreachBatch sink and must agree with the
batch-mode dedup_gate on identical inputs, route verdicts to the
admitted/rejected sinks, and recover through its checkpoint."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import dedup_gate
from stockpulse_spark.sources.tables import load_table
from stockpulse_spark.streaming.curation import start_curation_gate
from tests.conftest import SF_DIR


def _batch_docs(spark):
    """Planted three-tier batch over the testdata corpus: exact copies,
    5-word-dropped near-dups, and word-reversed (new) texts."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    w = F.split("text", " ")
    n = F.size(w)
    return (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        .unionAll(
            docs.filter(F.col("doc_id") % 5 == 1).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat_ws(" ", F.slice(w, 1, n - 5)).alias("text"),
            )
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 5 == 2).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat_ws(" ", F.reverse(w)).alias("text"),
            )
        )
    )


def test_stream_gate_matches_batch_gate(spark, tmp_path):
    corpus = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    batch = _batch_docs(spark)
    rows = batch.collect()

    # stream the same docs as two JSON files through the gate
    src = tmp_path / "src"
    src.mkdir()
    half = len(rows) // 2
    for name, chunk in (("b0.json", rows[:half]), ("b1.json", rows[half:])):
        Path(src, name).write_text(
            "\n".join(
                json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                for r in chunk
            )
        )
    admitted = str(tmp_path / "admitted")
    rejected = str(tmp_path / "rejected")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = start_curation_gate(stream, corpus, admitted, rejected, ckpt)
        q.awaitTermination(180)

    run_once()
    # restart with no new files: checkpoint must not re-admit anything
    run_once()

    adm = {r["doc_id"] for r in spark.read.parquet(admitted).collect()}
    rej = {
        r["doc_id"]: r["verdict"] for r in spark.read.parquet(rejected).collect()
    }
    assert len(adm) + len(rej) == len(rows)
    assert adm.isdisjoint(rej)

    want = {
        r["doc_id"]: r["verdict"]
        for r in dedup_gate(
            batch, corpus, batch_id_col="doc_id", corpus_id_col="doc_id"
        ).collect()
    }
    for did, v in want.items():
        if v == "new":
            assert did in adm, f"{did} should be admitted"
        else:
            assert rej.get(did) == v, f"{did}: want {v}, got {rej.get(did)}"
