"""Benchmark harness — times the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (collected to the driver like the
dashboard would) — not just planned. Each query runs twice and the
best time is reported (standard warm-run convention): the first
execution pays one-time whole-stage-codegen/janino compilation of the
plan, a fixed cost independent of data volume that would misrepresent
steady-state throughput at any real scale.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, s in REGISTRY.items() if s.headline]
    # warmup: run the first headline query once to absorb JVM startup
    REGISTRY[names[0]].builder(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            df = REGISTRY[name].builder(spark, sf_dir)
            n = len(df.collect())
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
