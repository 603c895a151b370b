"""Shuffle-volume audit: MEASURED per-query shuffle bytes vs corpus
size, via the Spark UI REST API (the same per-stage metrics a real
cluster's history server exposes).

Why this exists: every scale claim in the registry docstrings is a
statement about shuffle GROWTH ("one |keys| exchange", "the df cap
bounds the index join", "band buckets shuffle ints, not text").  Time
ratios (tools/scale_smoke.py) are an indirect proxy — a query can stay
fast while quietly shuffling quadratically until memory runs out at
the next decade.  This tool measures the thing itself: shuffle write
bytes, shuffle read bytes, input bytes, and disk spill per query at
sf0.1 and at an N-times replicated corpus (tools/scale_smoke's
decorrelated replicator), and reports the growth ratio against the
data growth N.  A query whose shuffle grows faster than data is
super-linear no matter how fast it looks today; one that spills at
10x will thrash at 100x.

Usage:
    python tools/shuffle_audit.py [N]            (default N=10)
    SPARK_SMOKE_ONLY=q1,q2 python tools/shuffle_audit.py

Writes one JSON line per run; the round artifact (SHUFFLE_r{N}.md)
is generated from it.  Deterministic: metrics come from the exact
plans the registry runs, on the deterministic replicated corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402

#: the audited set: every bench headliner plus the shapes whose
#: docstrings make the strongest shuffle claims (bounded pair
#: expansion, df caps, bucketed ANN, grouped global ranks, the new
#: wave-9 planner/governance queries)
QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "ohlcv_hourly",
    "ma5_cma",
    "bollinger20",
    "rsi14",
    "macd_12_26_9",
    "doc_text_stats",
    "doc_minhash_lsh",
    "embedding_cosine_topk",
    "indicator_panel",
    "asof_prev_close",
    # dedup / index shapes with explicit boundedness claims
    "snippet_containment_pairs",
    "doc_ngram_jaccard",
    "doc_dedup_funnel",
    "embedding_srp_ann",
    "source_log_odds_terms",
    "session_paths_topk",
    # wave 9 + recommender wave
    "k_anonymity_report",
    "split_leakage_audit",
    "join_cardinality_estimate",
    "code_detect_eval",
    "hill_tail_index",
    "customer_cf_neighbors",
    "popularity_rec_hitrate",
    "hash_partition_skew_report",
    # round 9 (verdict item 6): EVERY remaining query whose executed
    # plan carries >= 6 shuffles or any SortMergeJoin (PLANS.md) — the
    # audit now covers the full heavy-plan inventory, not a sample
    "ks_drift_by_source",
    "audience_overlap_sketch",
    "minhash_lsh_recall_eval",
    "ann_recall_eval",
    "containment_recall_eval",
    "nb_lang_classifier",
    "srp_ann_recall_certificate",
    "audio_fingerprint_near_dup",
    "image_phash_near_dup",
    "segment_type_chisq",
    "value_rank_family",
    "copurchase_pagerank",
    "leadlag_return_corr",
    "pairwise_return_corr",
    "textrank_keywords",
    "woe_binning",
    "basket_affinity_lift",
    "pq_adc_recall_eval",
    "sax_motifs",
    "word_pmi_collocations",
    "bm25_topk_docs",
    "cross_source_dup_matrix",
    "doc_fluency_filter",
    "doc_substring_dup_pairs",
    "embedding_label_outliers",
    "incremental_dedup_gate",
    "matryoshka_truncation_eval",
    "peak_concurrent_sessions_daily",
    "psi_value_drift",
    "quantile_normalize_doclen",
    "seasonal_profile",
    "sliding_7d_active_users",
    "user_cohort_set_ops",
    "embedding_ivf_topk",
    "dup_cluster_size_stats",
    "waiting_suppliers",
    "snapshot_diff_cdc",
    "copurchase_triangles",
    "daily_order_ship_reconciliation",
    "dedup_keeper_transitive",
    "orders_merge_upsert",
    # round-9 wave-10b
    "file_compaction_plan",
    "quality_keeper_selection",
    "score_decile_lift",
    # round-11 optimization: queries whose shuffle shape changed
    "missing_slots",
    "doc_simhash",
    "poisson_bootstrap_ci",
    "dtw_to_reference",
    "macd_unbounded_kernel",
    "heikin_ashi_daily",
    "cusum_returns",
    "dsir_importance_weights",
    "hard_negative_mining",
    "embedding_power_iteration",
    # round-12 optimization: the CC-loop fuse + pinned/broadcast graph
    # frames changed these queries' executed shapes
    "semantic_dedup_keepers",
    "doc_dedup_pipeline_full",
]

_only = os.environ.get("SPARK_SMOKE_ONLY")
if _only:
    QUERIES = [q for q in QUERIES if q in set(_only.split(","))]


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.load(r)


class StageMeter:
    """Accumulates per-stage metrics from the UI REST API, attributing
    newly completed stages to the query that just ran."""

    def __init__(self, spark):
        self._base = spark.sparkContext.uiWebUrl
        self._app = spark.sparkContext.applicationId
        self._seen: set[tuple[int, int]] = set()
        self.take()  # absorb warm-up stages

    def take(self) -> dict[str, int]:
        # completed-stage metrics can lag the job end: wait until the
        # status store reports no active stages, then one settle beat
        # (round 8b: a 0.3 s fixed sleep attributed ~260 MB of late
        # replicator stages to the next query's delta).  If the wait
        # exhausts, say so loudly — silently proceeding mis-attributes
        # the still-running stages to the NEXT query's delta (round-8
        # advisor finding).
        for attempt in range(20):
            time.sleep(0.5)
            active = _api(
                self._base,
                f"/api/v1/applications/{self._app}/stages?status=active",
            )
            if not active:
                break
        else:
            print(
                "WARNING: active stages remained after 10s wait — "
                "metrics for this query may bleed into the next delta",
                file=sys.stderr,
            )
        time.sleep(0.5)
        stages = _api(
            self._base,
            f"/api/v1/applications/{self._app}/stages?status=complete",
        )
        tot = {
            "shuffle_write": 0,
            "shuffle_read": 0,
            "input_bytes": 0,
            "spill_disk": 0,
            "n_stages": 0,
        }
        for s in stages:
            key = (s["stageId"], s["attemptId"])
            if key in self._seen:
                continue
            self._seen.add(key)
            tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
            tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
            tot["input_bytes"] += s.get("inputBytes", 0)
            tot["spill_disk"] += s.get("diskBytesSpilled", 0)
            tot["n_stages"] += 1
        return tot


def measure(spark, meter: StageMeter, sf_dir: str) -> dict[str, dict]:
    out = {}
    for name in QUERIES:
        df = REGISTRY[name].builder(spark, sf_dir)
        t0 = time.monotonic()
        # noop sink: full plan execution, no driver-side collect cost
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        m = meter.take()
        m["seconds"] = round(dt, 3)
        out[name] = m
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--catalog"]
    catalog = "--catalog" in sys.argv[1:]
    n = int(args[0]) if args else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "shuffle-audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            # the status store evicts stages past retainedStages; a
            # long audited run past the default 1000 would silently
            # drop early stages from a query's delta (round-8 advisor
            # finding) — retain enough for the whole audit
            "spark.ui.retainedStages": "100000",
        },
    )
    meter = StageMeter(spark)

    from tools.scale_smoke import build_big_dir

    small = measure(spark, meter, src)
    big_dir = build_big_dir(spark, src, n, catalog_growth=catalog)
    meter.take()  # absorb the replicator's own stages
    big = measure(spark, meter, big_dir)

    rows = {}
    for q in QUERIES:
        s, b = small[q], big[q]
        ratio = (
            round(b["shuffle_write"] / s["shuffle_write"], 2)
            if s["shuffle_write"]
            else None
        )
        rows[q] = {
            "small_shuffle_mb": round(s["shuffle_write"] / 1e6, 3),
            "big_shuffle_mb": round(b["shuffle_write"] / 1e6, 3),
            "shuffle_ratio": ratio,
            "input_ratio": (
                round(b["input_bytes"] / s["input_bytes"], 2)
                if s["input_bytes"]
                else None
            ),
            "small_spill_mb": round(s["spill_disk"] / 1e6, 3),
            "big_spill_mb": round(b["spill_disk"] / 1e6, 3),
            "small_s": s["seconds"],
            "big_s": b["seconds"],
        }
    print(
        json.dumps(
            {
                "metric": "shuffle_audit",
                "n": n,
                "sf_dir": src,
                "axis": "catalog_growing" if catalog else "catalog_fixed",
                "queries": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
