"""Compute-bound scaling artifact (r11 verdict item 2): time a
compute-heavy query subset on the 10x replicated corpus at the
SESSION'S granted core count, so an 8-core vs 32-core pair of runs
shows whether wall time follows cores once queries are no longer
floor-bound (at sf0.1 the headline set is dominated by fixed per-run
costs and the driver's low-core probe reads ≈1 by design —
BENCH_NOTES.md round-12 note).

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py [N] [--out=FILE]
    SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py [N] [--out=FILE]

Prints one JSON line: {"cpus": ..., "n": ..., "queries": {...}} with
per-query min seconds over 3 runs (1 untimed warmup).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402

# compute-heavy at 10x: the LSH signature+banding pass, the triangle
# wedge expansion, the CF inverted-index join, and one scan+agg
# calibration query for the floor comparison
QUERIES = [
    "pricing_summary",
    "doc_minhash_lsh",
    "copurchase_triangles",
    "customer_cf_neighbors",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1)
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    )
    n = int(args[0]) if args else 10
    spark = get_spark("scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    from tools.scale_smoke import build_big_dir

    tables = {"lineitem", "orders", "customer", "documents"}
    big = build_big_dir(
        spark, "/root/testdata/sf0.1", n, catalog_growth=True, tables=tables
    )
    out: dict[str, float] = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"scaling_probe: {name}")
        REGISTRY[name].builder(spark, big).collect()  # warmup
        best = None
        for _ in range(3):
            t0 = time.time()
            REGISTRY[name].builder(spark, big).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
    line = json.dumps(
        {
            "cpus": spark.sparkContext.defaultParallelism,
            "shuffle_partitions": spark.conf.get(
                "spark.sql.shuffle.partitions"
            ),
            "n": n,
            "queries": out,
        }
    )
    print(line)
    if opts.get("out"):
        with open(opts["out"], "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
