"""Property-based cross-engine parity.

The committed fuzz corpus (tools/fuzz_corpus.py) pins the hazard
classes round 6 fixed; this suite goes one step further and lets
hypothesis COMPOSE them: random small event tables mixing NULL values,
signed zeros, duplicate rows, NULL event types, and timestamp ties,
each run through the exact driver-gate compare. Any counterexample is
a new data-dependent divergence the deterministic corpus missed.

Generator discipline (to stay flake-free):
- values come from exact binary fractions only — no doubles within an
  ulp of a .5 decimal boundary, where Spark's shortest-decimal round
  and DuckDB's binary round legitimately disagree;
- derandomize=True so the gate is reproducible run-to-run;
- queries chosen to cover the classes cheaply (resample/minmax ties,
  rank NULL ordering, degenerate-duration division, grouped stats).
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stockpulse_spark.plans import REGISTRY
from tools.parity import compare, duck_con

# per-test example count: 5 keeps the suite CI-cheap; round-close deep
# hunts run `SP_HYP_EXAMPLES=25 pytest tests/test_property_parity.py`
_N_EXAMPLES = int(os.environ.get("SP_HYP_EXAMPLES", "5"))

VALUES = [None, -0.0, 0.0, 1.0, 2.5, -3.75, 100.0, 0.25, -0.5]
TYPES = ["click", "view", "purchase", None]
BASE = datetime(2024, 1, 1, 9, 30)

row = st.tuples(
    st.integers(min_value=1, max_value=10_000),  # event_id
    st.integers(min_value=0, max_value=20),  # hour offset (forces ties)
    st.integers(min_value=1, max_value=3),  # user_id
    st.sampled_from(TYPES),
    st.sampled_from(VALUES),
)

tables = st.lists(row, min_size=4, max_size=40)

QUERIES = (
    "ohlcv_hourly",
    "value_rank_family",
    "twap_daily",
    "asof_prev_close",
    "asof_tolerance_hour_close",
    "asof_forward_next_open",
    "asof_nearest_week_anchor",
    "returns_volatility",
    "latest_per_user",
    "sessionize_events",
    "hourly_p95_by_type",
    "value_band_islands",
    "event_transition_matrix",
    "leakage_free_training_set",
    "salted_skew_join_stats",
    "audience_overlap_sketch",
)


def _write_events(sf_dir: str, rows) -> None:
    """Single parquet FILE (pyarrow, µs timestamps) — the testdata
    layout both engines read; a Spark directory-write would break
    DuckDB's read_parquet on the bare path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array(
                [eid for (eid, _, _, _, _) in rows], pa.int64()
            ),
            "ts": pa.array(
                [BASE + timedelta(hours=h) for (_, h, _, _, _) in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(
                [uid for (_, _, uid, _, _) in rows], pa.int64()
            ),
            "event_type": pa.array(
                [et for (_, _, _, et, _) in rows], pa.string()
            ),
            "value": pa.array(
                [v for (_, _, _, _, v) in rows], pa.float64()
            ),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))


@pytest.mark.parametrize("name", QUERIES)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=tables)
def test_random_events_hash_parity(spark, name, rows):
    sf_dir = tempfile.mkdtemp(prefix="sp_prop_")
    _write_events(sf_dir, rows)
    con = duck_con(sf_dir)
    try:
        status, *_ = compare(name, spark, con, sf_dir, verbose=False)
    finally:
        con.close()
    assert status == "OK", f"{name}: {status} on rows={rows!r}"


DOC_WORDS = [
    "alpha", "beta", "the", "naïve", "a|b", "", "中文", "zz",
    # gopher_quality_rules fodder: symbol words, bullets, ellipses
    "#tag", "...", "-", "with",
]

doc_row = st.tuples(
    st.integers(min_value=1, max_value=500),  # doc_id
    st.one_of(
        st.none(),
        st.lists(
            st.sampled_from(DOC_WORDS), min_size=0, max_size=12
        ).map(" ".join),
    ),
    st.sampled_from(["web", "book"]),
)

doc_tables = st.lists(doc_row, min_size=2, max_size=25)

DOC_QUERIES = (
    "doc_text_stats",
    "doc_dedup_exact",
    "doc_word_entropy",
    "corpus_segment_dedup",
    "doc_repetition_score",
    "doc_quality_filter",
    "tfidf_top_terms",
    "gopher_quality_rules",
    "duplicate_gram_coverage",
    "image_phash_near_dup",
    "audio_fingerprint_near_dup",
    "dsir_importance_weights",
    "cross_source_dup_matrix",
    "vocab_coverage_curve",
    "packing_efficiency_report",
    "token_frequency_spectrum",
    "quantile_normalize_doclen",
    "source_length_calibration",
    "content_defined_chunk_dedup",
    # round-8 wave: containment/df-cap boundaries, ECDF ties, fold
    # hashing, BM25 ln-arithmetic, log-odds smoothing, and the regex
    # tokenizer all exercised over random degenerate shapes
    "snippet_containment_pairs",
    "containment_recall_eval",
    "ks_drift_by_source",
    "kfold_assignment_report",
    "bm25_topk_docs",
    "source_log_odds_terms",
    "tokenizer_fertility_by_lang",
    # round-9 wave: LSH precision exact-verify arithmetic, grouped-rank
    # cap boundaries, chunk closed form at degenerate lengths, band
    # churn on NULL/short texts, and the NULL-text keeper contract,
    # all over random degenerate shapes
    "lsh_precision_sample",
    "domain_cap_enforcement",
    "chunk_stride_plan",
    "lsh_band_churn",
    "dedup_token_savings",
    "file_compaction_plan",
    "quality_keeper_selection",
)


def _write_documents(sf_dir: str, rows) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([d for (d, _, _) in rows], pa.int64()),
            "text": pa.array([t for (_, t, _) in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([s for (_, _, s) in rows], pa.string()),
            "n_chars": pa.array(
                [len(t) if t is not None else None for (_, t, _) in rows],
                pa.int64(),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))


@pytest.mark.parametrize("name", DOC_QUERIES)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=doc_tables)
def test_random_documents_hash_parity(spark, name, rows):
    sf_dir = tempfile.mkdtemp(prefix="sp_prop_")
    _write_documents(sf_dir, rows)
    con = duck_con(sf_dir)
    try:
        status, *_ = compare(name, spark, con, sf_dir, verbose=False)
    finally:
        con.close()
    assert status == "OK", f"{name}: {status} on rows={rows!r}"


# --- embeddings: NULL vectors, zero vectors, constant dims, tiny n ---
#
# vec_id stays UNIQUE (it is the table's primary key per TESTDATA.md;
# the knn/topk family is entitled to that contract).  Vector content is
# a deterministic function of a small seed so hypothesis shrinks over
# table SHAPE, not 64 floats per row; all values are exact binary
# fractions (survive the float32 storage round-trip bit-for-bit).

EMB_DIM = 64
EMB_PALETTE = [0.0, 0.5, -0.25, 1.0, 2.0, -1.5, 0.75, -0.125]


def _vec(kind: int):
    if kind == -2:
        return None  # NULL vector: NULL cosine/bucket, never a crash
    if kind == -1:
        return [0.0] * EMB_DIM  # zero norm: guarded division both sides
    if kind == 0:
        return [1.0] * EMB_DIM  # constant vector -> constant dims
    return [
        EMB_PALETTE[(kind * 7 + i) % len(EMB_PALETTE)]
        for i in range(EMB_DIM)
    ]


emb_row = st.tuples(
    st.integers(min_value=1, max_value=200),  # vec_id (unique, see below)
    st.integers(min_value=-2, max_value=5),  # vector kind/seed
    st.integers(min_value=0, max_value=2),  # label
)

emb_tables = st.lists(
    emb_row, min_size=3, max_size=30, unique_by=lambda r: r[0]
)

EMB_QUERIES = (
    "embedding_quantize_int8",
    "embedding_dim_correlation",
    "embedding_knn_classify",
    "embedding_label_outliers",
    "label_centroid_similarity",
    "hard_negative_mining",
    "pq_codebook_assign",
    "pq_adc_recall_eval",
    "matryoshka_truncation_eval",
)


def _write_embeddings(sf_dir: str, rows) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array([v for (v, _, _) in rows], pa.int64()),
            "embedding": pa.array(
                [_vec(k) for (_, k, _) in rows],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([l for (_, _, l) in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"))


@pytest.mark.parametrize("name", EMB_QUERIES)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=emb_tables)
def test_random_embeddings_hash_parity(spark, name, rows):
    sf_dir = tempfile.mkdtemp(prefix="sp_prop_")
    _write_embeddings(sf_dir, rows)
    con = duck_con(sf_dir)
    try:
        status, *_ = compare(name, spark, con, sf_dir, verbose=False)
    finally:
        con.close()
    assert status == "OK", f"{name}: {status} on rows={rows!r}"


# --- warehouse: random degenerate orders + lineitem ------------------
#
# NULL prices/dates/flags, signed zeros, zero prices, month-boundary
# dates — the TPC-H fuzz-mutator classes, but hypothesis-composed over
# random table shapes. Primary keys stay unique (o_orderkey and
# (l_orderkey, l_linenumber) per the TPC-H contract); exact-duplicate-
# row pressure is the deterministic mutator's job. Money values are
# exact binary fractions (.25/.5/.125) so no round-boundary ulps.

PRICES = [None, -0.0, 0.0, 1.25, 100.5, 2048.0, 3.75, 977.25]
DISCOUNTS = [None, 0.0, -0.0, 0.25, 0.5]
WH_BASE = datetime(2024, 1, 15)

order_row = st.tuples(
    st.integers(min_value=1, max_value=300),  # o_orderkey (unique)
    st.integers(min_value=1, max_value=5),  # o_custkey
    st.sampled_from(["O", "F", None]),  # o_orderstatus
    st.sampled_from(PRICES),  # o_totalprice
    st.one_of(  # o_orderdate: NULL or spanning month/year boundaries
        st.none(), st.integers(min_value=0, max_value=400)
    ),
    st.sampled_from(["1-URGENT", "3-MEDIUM", None]),
)

line_row = st.tuples(
    st.integers(min_value=1, max_value=300),  # l_orderkey
    st.integers(min_value=1, max_value=7),  # l_linenumber
    st.sampled_from([None, 0.0, 1.0, 5.0, 50.0]),  # l_quantity
    st.sampled_from(PRICES),  # l_extendedprice
    st.sampled_from(DISCOUNTS),  # l_discount
    st.sampled_from(["A", "N", "R", None]),  # l_returnflag
    st.sampled_from(["O", "F"]),  # l_linestatus
    st.one_of(st.none(), st.integers(min_value=0, max_value=400)),
)

wh_tables = st.tuples(
    st.lists(order_row, min_size=2, max_size=25, unique_by=lambda r: r[0]),
    st.lists(
        line_row,
        min_size=2,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    ),
)

WH_QUERIES = (
    "join_ivm_delta_check",
    "pricing_summary",
    "weighted_median_price",
    "gini_revenue_yearly",
    "cohort_ltv_monthly",
    "order_backlog_daily",
    "rfm_segmentation",
    "revenue_wow_growth",
    "revenue_seasonal_decompose",
    "min_cost_supplier",
    "customer_order_distribution",
    "top_order_per_customer",
)


def _write_warehouse(sf_dir: str, orders, lines) -> None:
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    # static dims so the star/join queries resolve: real sf0.001
    # part/supplier/nation/region, plus a tiny customer table with
    # degenerate balances/segments covering every generated custkey
    for t in ("part", "supplier", "nation", "region"):
        shutil.copyfile(
            f"/root/testdata/sf0.001/{t}.parquet",
            os.path.join(sf_dir, f"{t}.parquet"),
        )
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_name": pa.array(
                [f"Customer#{i}" for i in range(1, 6)], pa.string()
            ),
            "c_nationkey": pa.array([0, 1, 2, 3, None], pa.int32()),
            "c_acctbal": pa.array(
                [None, -0.0, 0.0, 100.5, -3.75], pa.float64()
            ),
            "c_mktsegment": pa.array(
                ["BUILDING", None, "MACHINERY", "BUILDING", "AUTOMOBILE"],
                pa.string(),
            ),
        }
    )
    pq.write_table(cust, os.path.join(sf_dir, "customer.parquet"))

    def _d(days):
        return None if days is None else WH_BASE + timedelta(days=days)

    ot = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
            "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
            "o_orderstatus": pa.array(
                [r[2] for r in orders], pa.string()
            ),
            "o_totalprice": pa.array(
                [r[3] for r in orders], pa.float64()
            ),
            "o_orderdate": pa.array(
                [_d(r[4]) for r in orders], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                [r[5] for r in orders], pa.string()
            ),
        }
    )
    lt = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
            "l_partkey": pa.array(
                [r[0] % 20 + 1 for r in lines], pa.int64()
            ),
            "l_suppkey": pa.array(
                [r[0] % 5 + 1 for r in lines], pa.int64()
            ),
            "l_linenumber": pa.array([r[1] for r in lines], pa.int32()),
            "l_quantity": pa.array([r[2] for r in lines], pa.float64()),
            "l_extendedprice": pa.array(
                [r[3] for r in lines], pa.float64()
            ),
            "l_discount": pa.array([r[4] for r in lines], pa.float64()),
            "l_tax": pa.array(
                [0.125 if r[1] % 2 else 0.0 for r in lines], pa.float64()
            ),
            "l_returnflag": pa.array([r[5] for r in lines], pa.string()),
            "l_linestatus": pa.array([r[6] for r in lines], pa.string()),
            "l_shipdate": pa.array(
                [_d(r[7]) for r in lines], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(ot, os.path.join(sf_dir, "orders.parquet"))
    pq.write_table(lt, os.path.join(sf_dir, "lineitem.parquet"))


@pytest.mark.parametrize("name", WH_QUERIES)
@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tabs=wh_tables)
def test_random_warehouse_hash_parity(spark, name, tabs):
    sf_dir = tempfile.mkdtemp(prefix="sp_prop_")
    _write_warehouse(sf_dir, *tabs)
    con = duck_con(sf_dir)
    try:
        status, *_ = compare(name, spark, con, sf_dir, verbose=False)
    finally:
        con.close()
    assert status == "OK", f"{name}: {status} on tabs={tabs!r}"
