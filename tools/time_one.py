"""Time one registry query the way bench.py does (1 untimed warmup +
N timed runs, report min/median/spread) — the bisection probe for
round-over-round per-query regressions.

Usage: python tools/time_one.py <query> [sf_dir] [n_runs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    spark = get_spark("time_one")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY[name].builder(spark, sf_dir).collect()  # warmup
    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        n = len(REGISTRY[name].builder(spark, sf_dir).collect())
        runs.append(time.time() - t0)
    runs_s = sorted(runs)
    print(
        f"{name}: min={runs_s[0]:.3f} med={runs_s[len(runs_s) // 2]:.3f} "
        f"spread={runs_s[-2] - runs_s[0]:.3f} rows={n} runs={runs_s}"
    )


if __name__ == "__main__":
    main()
