"""Repetition-based parity stability probe.

DuckDB's parallel window sort places a NULL ORDER-BY key unstably and
both engines fold float sums in nondeterministic order, so a
data-dependent parity bug can be FLAKY: one green sweep proves
nothing (SCALE.md round-6 second wave). This tool runs the driver-gate
compare N times per query against a corpus and reports any query that
is not green on EVERY repetition — the detector that caught
revenue_seasonal_decompose flickering 26/162/0 differing cells
run-to-run.

Usage:
  python tools/stability_probe.py <sf_dir> [-n 5] [query ...]
  (no query names = every oracle-backed registry query — slow; use
  after a sweep flags a suspect, or on a hazard shortlist)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402
from tools.parity import compare, duck_con  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("names", nargs="*")
    ap.add_argument("-n", "--reps", type=int, default=5)
    # intermixed: `probe.py <sf_dir> -n 3 q1 q2` and
    # `probe.py -n 3 <sf_dir> q1 q2` both parse
    args = ap.parse_intermixed_args()

    names = args.names or [
        n for n, spec in REGISTRY.items() if spec.oracle is not None
    ]
    spark = get_spark("stability_probe")
    flaky: list[str] = []
    for name in names:
        statuses = []
        for _ in range(args.reps):
            con = duck_con(args.sf_dir)
            try:
                status, *_ = compare(
                    name, spark, con, args.sf_dir, verbose=False
                )
            finally:
                con.close()
            statuses.append(status)
        ok = sum(1 for s in statuses if s == "OK")
        mark = "✓" if ok == args.reps else "✗"
        print(f" {mark} {name:<28} {ok}/{args.reps} green", flush=True)
        if ok != args.reps:
            flaky.append(name)
            for s in statuses:
                if s != "OK":
                    print(f"      {s}", flush=True)
    if flaky:
        print(f"FLAKY: {' '.join(flaky)}")
        return 1
    print(f"stable: {len(names)} queries x {args.reps} reps all green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
