"""Adversarial-data parity pinning.

Round 6 ran the full registry against a mutated corpus
(tools/fuzz_corpus.py: NULL/empty/short/delimiter/unicode/boilerplate
texts, NULL and signed-zero event values, exact duplicate rows, NULL
event types, all-zero embeddings) and fixed ~100 data-dependent
divergences — NULL-skipping min_by/max_by, the no-empty-bar contract,
NULLS LAST rank windows, guarded divisions, array_to_string-of-empty
NULL, signed-zero ROUND canonicalization. These tests keep that work
from regressing: one representative query per hazard class runs
through the SAME driver-gate compare on a freshly-built fuzz corpus.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

from stockpulse_spark.plans.registry import _signzero_canon
from tools.parity import compare, duck_con

REPO = Path(__file__).resolve().parent.parent

# one per fixed hazard class (kept small: the full fuzz sweep is a
# round-close activity via tools/parity.py, not a per-commit cost)
FUZZ_PINNED = [
    "ohlcv_hourly",  # skip-NULL max_by + no-empty-bar contract
    "sma_50_200",  # signed-zero close through the window family
    "macd_unbounded_kernel",  # Arrow kernel over NULL-free series
    "vwap",  # NULL-skipping fold vs list_reduce FILTER
    "value_rank_family",  # asc_nulls_last rank windows
    "twap_daily",  # zero-duration segment division
    "doc_text_stats",  # empty-text ratio guards
    "doc_minhash_lsh",  # short-doc shingles + boilerplate buckets
    "doc_simhash_hamming_pairs",  # empty-slice NULL vs '' alignment
    "embedding_cosine_topk",  # zero-norm vector -> NULL cosine
    "value_percentiles_approx",  # null-safe certification join
    "pii_redaction_audit",  # coalesced NULL-text injection
    "burst_detection_viterbi",  # NULL-typed events excluded
    "mergeable_weekly_rollup",  # single-observation variance guard
    # TPC-H-table fuzz wave (NULL measures/keys/dates, -0.0 prices,
    # duplicate lines planted in lineitem/orders/customer):
    "weighted_median_price",  # NULL price/wt out of the cumsum order
    "order_backlog_daily",  # NULL day out of the scan-line cumsum
    "cohort_ltv_monthly",  # NULL month out of cohort/LTV axes
    "gini_revenue_yearly",  # NULL cents out of the rank ORDER BY
    "promo_revenue_monthly",  # None-vs-NaT month cell canon
    "pricing_summary",  # NULL measures through TPC-H Q1 aggregates
    "revenue_by_nation",  # star join under NULL keys/prices
    "min_cost_supplier",  # all-NULL cost group out of the rank order
    "revenue_seasonal_decompose",  # NULL month: unstable DuckDB window sort
    "revenue_wow_growth",  # NULL week excluded + integer-cents snap
    "max_drawdown",  # zero running peak: NULL drawdown, not ANSI raise
    # round-8 wave representatives:
    "snippet_containment_pairs",  # df cap + short/NULL texts through the index
    "containment_recall_eval",  # planted cohorts over degenerate corpora
    "ks_drift_by_source",  # NULL source/length out of the ECDF grid
    "bm25_topk_docs",  # NULL text out of dl; ln-arithmetic under ties
    "tokenizer_fertility_by_lang",  # unicode through both regex engines
    # round-8b wave representatives:
    "split_leakage_audit",  # residue ids + split cells over mutated texts
    "join_cardinality_estimate",  # heavy-hitter branch under planted hot keys
    "hill_tail_index",  # NaN/±inf money masked before the top-k
    "customer_cf_neighbors",  # df cap + NULL keys through the CF index
    "code_detect_eval",  # NULL/empty/unicode text through the feature scan
    # round-9 wave representatives:
    "lsh_precision_sample",  # exact verify over degenerate LSH candidates
    "domain_cap_enforcement",  # NULL text/source through the grouped rank
    "freshness_decay_weights",  # NULL dates out of the decay buckets
    "dedup_token_savings",  # NULL-text never-dropped contract under dup rows
    "quality_keeper_selection",  # NULL/short texts through the prefix windows
    "score_decile_lift",  # NULL dates/balances through rank + ntile
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("fuzz_sf")
    subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "fuzz_corpus.py"),
            "/root/testdata/sf0.001",
            str(dst),
        ],
        check=True,
        capture_output=True,
    )
    return str(dst)


@pytest.mark.parametrize("name", FUZZ_PINNED)
def test_fuzz_parity_pinned(spark, fuzz_dir, name):
    con = duck_con(fuzz_dir)
    try:
        status, *_ = compare(name, spark, con, fuzz_dir, verbose=False)
    finally:
        con.close()
    assert status == "OK", f"{name} on fuzz corpus: {status}"


def test_signzero_canon_wraps_balanced():
    """The registration-time rewrite must wrap every ROUND(...) —
    nested calls, lambdas, quoted strings — in (... + 0.0) without
    breaking balance or operator precedence."""
    assert (
        _signzero_canon("SELECT ROUND(x, 6) AS a")
        == "SELECT (ROUND(x, 6) + 0.0) AS a"
    )
    # precedence: the wrap must bind before a following division
    assert (
        _signzero_canon("ROUND(a, 6) / b") == "(ROUND(a, 6) + 0.0) / b"
    )
    # nested + lambda + quoted paren stay balanced
    s = _signzero_canon(
        "ROUND(list_reduce(list_transform(x, i -> f(i, ')')), "
        "(a, b) -> a + b), 6)"
    )
    assert s.startswith("(ROUND(") and s.endswith(" + 0.0)")
    # the quoted "')'" paren must NOT have terminated the match early
    assert "(a, b) -> a + b), 6) + 0.0)" in s
    # case-insensitive, multiple sites
    out = _signzero_canon("round(a, 2) + ROUND(b, 4)")
    assert out == "(round(a, 2) + 0.0) + (ROUND(b, 4) + 0.0)"


def test_signzero_canon_kills_negative_zero():
    """DuckDB ROUND preserves -0.0; the canonicalized form must not."""
    con = duckdb.connect()
    # a tiny negative DOUBLE rounds to -0.0 in DuckDB (a decimal
    # literal -0.0 would round to unsigned Decimal 0.0 instead)
    raw, canon = con.execute(
        "SELECT ROUND(-1e-9, 6), " + _signzero_canon("ROUND(-1e-9, 6)")
    ).fetchone()
    assert str(raw) == "-0.0"
    assert str(canon) == "0.0"


# one per empty-corpus hazard class (tools/empty_corpus.py docstring
# lists the classes; the full empty sweep is a round-close activity)
EMPTY_PINNED = [
    "event_funnel",  # NULLIF: empty stage is NULL, not ANSI raise/NaN
    "rollup_revenue",  # populated-groups-only ROLLUP contract
    "cube_order_stats",  # same for CUBE
    "grouping_sets_revenue",  # same for GROUPING SETS
    "srp_ann_recall_certificate",  # zero-query gate COALESCEs FALSE
    "dq_expectation_suite",  # zero-rows-checked is a vacuous pass
    "pricing_summary",  # plain grouped agg: empty in, empty out
    "ma5_cma",  # window family over an empty bar table
    "doc_minhash_lsh",  # LSH machinery over an empty corpus
    "rfm_segmentation",  # grouped-rank machinery over zero customers
    "snippet_containment_pairs",  # containment index over zero docs
    "ks_drift_by_source",  # n_s < N filter never divides by zero
    "kfold_assignment_report",  # empty in, empty out (no NULL share row)
    # round-8b wave representatives:
    "join_cardinality_estimate",  # total boolean certificate at 0 rows
    "hill_tail_index",  # empty top frame -> NULL estimator, 1 row
    "popularity_rec_hitrate",  # NULL cutoff path: one all-NULL-safe row
    "hash_partition_skew_report",  # 0-row keys stay balanced=TRUE
    # round-9 wave representatives:
    "chunk_stride_plan",  # empty in, empty out (no 0-token chunk row)
    "lsh_band_churn",  # empty corpus -> 0 band rows, no 0/0 churn
    "file_compaction_plan",  # empty in, empty out (no 0-byte file row)
    "score_decile_lift",  # 0 customers -> 0 decile rows, no 0/0 lift
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("empty_sf")
    subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "empty_corpus.py"),
            str(dst),
        ],
        check=True,
        capture_output=True,
    )
    return str(dst)


@pytest.mark.parametrize("name", EMPTY_PINNED)
def test_empty_corpus_parity_pinned(spark, empty_dir, name):
    con = duck_con(empty_dir)
    try:
        status, *_ = compare(name, spark, con, empty_dir, verbose=False)
    finally:
        con.close()
    assert status == "OK", f"{name} on empty corpus: {status}"
