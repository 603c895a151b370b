"""Time every batch registry query the way bench.py does (1 untimed
warmup + N timed runs, min reported) in ONE session, sequentially, and
emit a JSON ranking — the optimization round's measure-first pass over
the full registry (guide §1), not just the headline set.

Streaming queries (tag 'streaming-run') are skipped by default: their
wall time is microbatch scheduling overhead, not plan cost, and they
hold the session's streaming state.

Usage: python tools/time_all.py [sf_dir] [n_runs] [--out=FILE]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_runs = int(args[1]) if len(args) > 1 else 3
    out_path = opts.get("out")

    spark = get_spark("time_all")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        if "streaming-run" in spec.tags or name.startswith("stream_"):
            continue
        try:
            spark.sparkContext.setJobDescription(f"time_all: {name} warmup")
            t_w0 = time.time()
            spec.builder(spark, sf_dir).collect()
            warm = time.time() - t_w0
            runs = []
            for i in range(n_runs):
                spark.sparkContext.setJobDescription(f"time_all: {name} run {i}")
                t0 = time.time()
                n = len(spec.builder(spark, sf_dir).collect())
                runs.append(time.time() - t0)
            results[name] = {
                "min": round(min(runs), 3),
                "med": round(statistics.median(runs), 3),
                "warm": round(warm, 3),
                "rows": n,
            }
            print(
                f"{results[name]['min']:8.3f}  {name} (med={results[name]['med']:.3f},"
                f" warmup={warm:.3f}, rows={n})",
                file=sys.stderr,
                flush=True,
            )
        except Exception as exc:  # keep sweeping; record the failure
            results[name] = {"error": str(exc)[:200]}
            print(f"   ERROR  {name}: {exc}", file=sys.stderr, flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    ranked = dict(
        sorted(
            results.items(),
            key=lambda kv: -(kv[1].get("min") or 0.0),
        )
    )
    payload = json.dumps({"sf_dir": sf_dir, "n_runs": n_runs, "queries": ranked})
    if out_path:
        Path(out_path).write_text(payload)
    print(payload)


if __name__ == "__main__":
    main()
