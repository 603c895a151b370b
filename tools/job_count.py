"""Count the Spark JOBS one query invocation launches (plus wall time)
— the evidence artifact for action-count optimizations (guide §1: for
round-trip-bound iterative queries the per-job fixed cost dominates, so
"one action per round" is the claim to prove, and the status tracker's
job-group listing proves it).

Usage: python tools/job_count.py <query> [query ...] [--sf=DIR] [--runs=N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1)
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    )
    sf_dir = opts.get("sf", "/root/testdata/sf0.1")
    n_runs = int(opts.get("runs", "3"))
    spark = get_spark("job_count")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    for name in names:
        REGISTRY[name].builder(spark, sf_dir).collect()  # warmup
        best, jobs, n = None, None, 0
        for i in range(n_runs):
            group = f"jc_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            n = len(REGISTRY[name].builder(spark, sf_dir).collect())
            dt = time.time() - t0
            ids = sc.statusTracker().getJobIdsForGroup(group)
            best = dt if best is None else min(best, dt)
            jobs = len(ids)
        print(f"{name}: jobs={jobs} min_sec={best:.3f} rows={n}")


if __name__ == "__main__":
    main()
