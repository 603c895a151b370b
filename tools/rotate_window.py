"""Compute the next driver-window rotation.

The driver's correctness gate records rows for the FIRST 50 entries of
`queries()`. `registry.py:WINDOW_PRIORITY` controls that order. This
tool scans every CORRECTNESS_r*.json in the repo root, finds the
oracle-backed queries that have NEVER had a driver row, and prints the
next 50-name WINDOW_PRIORITY tuple (rows-only queries excluded — the
driver's weaker rows-only check adds nothing over the local parity
artifact). Paste the output over the existing tuple each round until
every query has driver-grade evidence.

Usage: python tools/rotate_window.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY, oracle_sql  # noqa: E402


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        seen.update(json.load(open(f)))
    backed = set(oracle_sql())
    unseen = [n for n in REGISTRY if n in backed and n not in seen]
    covered = [n for n in REGISTRY if n in seen]
    print(
        f"# {len(seen)} queries have driver rows; {len(unseen)} "
        f"oracle-backed never-driver-checked remain",
        file=sys.stderr,
    )
    window = unseen[:50]
    # backfill with the longest-unchecked covered queries if fewer than
    # 50 remain, so the window is always full
    window += [n for n in covered if n not in window][: 50 - len(window)]
    print("WINDOW_PRIORITY: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
