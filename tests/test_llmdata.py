"""Behavioral tests for the training-data operators: the dedup funnel
must FIND planted near-duplicates, the ANN path must have reasonable
recall against the exact baseline, and the multimodal kernel must
stream Arrow batches with the declared schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
)
from stockpulse_spark.llmdata.multimodal import attach_payload, extract_media_metadata
from stockpulse_spark.llmdata.similarity import cosine_topk, srp_lsh_topk
from stockpulse_spark.plans.registry_llmdata import _mutated_corpus
from stockpulse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_exact_dedup_finds_doubles(spark, docs):
    out = exact_dedup(docs.unionAll(docs)).collect()
    assert all(r["n_copies"] == 2 for r in out)
    assert len(out) == docs.count()


def test_minhash_finds_planted_near_dups(spark):
    corpus = _mutated_corpus(spark, SF_DIR)
    n_docs = corpus.count() // 2
    pairs = minhash_lsh_pairs(corpus, k=16, bands=8, threshold=0.5).collect()
    planted = {(r["doc_id_1"], r["doc_id_2"]) for r in pairs
               if r["doc_id_2"] == r["doc_id_1"] + 1000000}
    # dropping 5 words of >=10 keeps Jaccard high; LSH must recover
    # the large majority of planted pairs
    assert len(planted) > 0.6 * n_docs, f"{len(planted)}/{n_docs}"


def test_ngram_jaccard_verifies_planted(spark):
    corpus = _mutated_corpus(spark, SF_DIR)
    pairs = ngram_jaccard_pairs(corpus, group_col=None, threshold=0.5).collect()
    planted = [r for r in pairs if r["doc_id_2"] == r["doc_id_1"] + 1000000]
    assert planted
    assert all(0.0 < r["jaccard"] <= 1.0 for r in pairs)


def test_simhash_buckets_near_dups(spark, docs):
    """A doc and its lightly-mutated copy should have close (often
    equal) simhashes; unrelated docs usually differ."""
    sim = simhash32(docs)
    vals = [r["simhash"] for r in sim.collect()]
    assert len(vals) == docs.count()
    assert all(0 <= v < 2**32 for v in vals)
    # identical text → identical hash (determinism)
    sim2 = {r["doc_id"]: r["simhash"] for r in simhash32(docs).collect()}
    sim1 = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert sim1 == sim2


def test_srp_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(queries, emb, k=3).collect()
    approx = srp_lsh_topk(queries, emb, k=3, n_planes=4, n_tables=8, dim=64).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 8 tables × 4 planes: expected recall ≈ 1-(1-p^4)^8 ≈ 0.75 for
    # neighbors at cosine ~0.4 (p = 1 - θ/π ≈ 0.63)
    assert recall >= 0.5, f"recall={recall:.2f}"


def test_media_metadata_kernel(spark, docs):
    out = extract_media_metadata(attach_payload(docs))
    rows = out.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["byte_len"] > 0
    assert 16 <= r["width"] < 528 and 16 <= r["height"] < 528
    assert r["decode_ok"] is False  # decoder is stubbed here
    assert out.schema.simpleString().startswith(
        "struct<doc_id:bigint,byte_len:bigint,format:string,width:int,height:int"
    )
