"""Merge the round-10 1000x decade measurements into SCALE1000_r10.json.

The timing run happens in two phases (build reuse + a 48g rerun after
the 16g execution-pool OOM finding — see SCALE.md round 10): base
timings must come from a SOLO run (the first rerun's base phase ran
concurrently with builder activity and is inflated 1.5-3x), scaled
timings from the solo 48g run's stderr.  This script re-times the base
tier solo, parses the scaled lines from the given stderr file, and
writes the merged artifact.

Usage: python tools/merge_decade1000.py /tmp/decade1000_r10b.err
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.decade1000 import QUERIES, time_queries  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402


def main() -> None:
    err_file = sys.argv[1]
    raw = Path(err_file).read_text().replace("\r", "\n")
    scaled: dict[str, float] = {}
    for m in re.finditer(
        r"^# (sp_scale1000x_\S+) (\S+): ([0-9.]+)s$", raw, re.M
    ):
        scaled[m.group(2)] = float(m.group(3))
    missing = [q for q in QUERIES if q not in scaled]
    if missing:
        print(f"# scaled timings missing: {missing}", file=sys.stderr)
    spark = get_spark("decade1000_base")
    spark.sparkContext.setLogLevel("ERROR")
    base = time_queries(spark, "/root/testdata/sf0.1")
    out = {
        "metric": "decade1000_smoke",
        "replication": 1000,
        "driver_mem": "48g (16g execution pool OOMed popularity_rec_"
        "hitrate's candidate hash-agg at this tier; see SCALE.md)",
        "shuffle_partitions_scaled": 256,
        "base": base,
        "scaled": scaled,
        "ratio": {
            q: round(scaled[q] / base[q], 2)
            for q in QUERIES
            if q in scaled and q in base
        },
    }
    Path("SCALE1000_r10.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
