"""Third-decade (1000x) scale smoke — round 9.

Builds a 1000x replication of sf0.1 for the tables the subset needs
(events is skipped: its queries' 100x trend is already measured and a
1B-row single-node parquet write buys no new information), then times
each query at sf0.1 and at 1000x (1 warmup-free run + 1 repeat, min
reported — these are decade-trend measurements, not benchmarks).

Usage: python tools/decade1000.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import build_big_dir  # noqa: E402

QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "popularity_rec_hitrate",
    "score_decile_lift",
    "k_anonymity_report",
    "chunk_stride_plan",
    "domain_cap_enforcement",
    "dedup_token_savings",
    "doc_minhash_lsh",
    "embedding_cosine_topk",
]

TABLES = {"lineitem", "orders", "customer", "documents", "embeddings"}

import os as _os  # noqa: E402

_only = _os.environ.get("SPARK_SMOKE_ONLY")
if _only:
    QUERIES = [q for q in QUERIES if q in set(_only.split(","))]


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            REGISTRY[name].builder(spark, sf_dir).collect()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
        print(f"# {sf_dir.split('/')[-1]} {name}: {best:.3f}s", file=sys.stderr)
    return out


def main() -> None:
    import os

    src = "/root/testdata/sf0.1"
    spark = get_spark("decade1000")
    spark.sparkContext.setLogLevel("ERROR")
    big = os.environ.get("SPARK_DECADE_DIR")
    if not big:
        t0 = time.time()
        big = build_big_dir(spark, src, 1000, tables=TABLES)
        print(f"# build: {time.time() - t0:.1f}s -> {big}", file=sys.stderr)
    base = time_queries(spark, src)
    # partition sizing is data-proportional (SCALE.md doctrine: a
    # partition must fit in executor memory at the target SF): 32
    # partitions at 600M-row shuffles put ~19M rows in one hash-agg
    # task and the first run died UNABLE_TO_ACQUIRE_MEMORY.  256 here
    # ~ what cluster_conf prescribes; AQE coalesces the small stages
    # back down, so only the big shuffles actually fan out.
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    scaled = time_queries(spark, big)
    print(
        json.dumps(
            {
                "metric": "decade1000_smoke",
                "replication": 1000,
                "base": base,
                "scaled": scaled,
                "ratio": {q: round(scaled[q] / base[q], 2) for q in QUERIES},
            }
        )
    )


if __name__ == "__main__":
    main()
