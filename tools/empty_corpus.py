"""Write a schema-correct 0-row copy of every testdata table.

The degenerate-cardinality corpus: a 100 TB pipeline routinely sees
empty days, empty partitions, and filters that eliminate every row —
and empty input is where engine semantics quietly fork.  The round-7
sweep over this corpus found and closed four classes:

- Spark ANSI DIVIDE_BY_ZERO raising where DuckDB yields NaN on an
  empty-stage ratio (event_funnel — fixed with NULLIF on both sides);
- ROLLUP/CUBE/GROUPING SETS: ANSI emits the () grand-total row even
  on empty input, Spark emits nothing (rollup_revenue,
  cube_order_stats, grouping_sets_revenue — contract pinned to
  "populated groups only" via HAVING COUNT(*) > 0 in the oracles, a
  no-op on any non-empty input);
- NULL booleans from aggregates over zero rows rendering differently
  (None vs NaN) through the driver's canonicalizer
  (srp_ann_recall_certificate's meets_gate — now COALESCEd to FALSE,
  a zero-query gate fails conservatively; dq_expectation_suite's
  passed — now TRUE, zero rows checked is a vacuous pass).

Usage: python tools/empty_corpus.py [dst_dir]
Then:  python tools/parity.py --jobs=6 <dst_dir>   # must be 0 x
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.schemas import TESTDATA_TABLES  # noqa: E402

SRC = "/root/testdata/sf0.001"


def write_empty(dst: str, src: str = SRC) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TESTDATA_TABLES:
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(
            pa.table(
                {f.name: pa.array([], type=f.type) for f in schema},
                schema=schema,
            ),
            os.path.join(dst, f"{t}.parquet"),
        )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/empty_sf"
    write_empty(out)
    print(f"wrote 0-row tables to {out}")
