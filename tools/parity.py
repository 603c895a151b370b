"""Local mimic of the driver's DuckDB-oracle correctness gate.

For each registry entry: run the Spark query and the oracle SQL at the
given sf dir, then compare row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns). Floats are compared exactly AND with tolerance, so we
can see whether a mismatch is a real semantic bug or a hashing-level
float divergence (which would also fail the driver's hash).

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from stockpulse_spark.plans import REGISTRY  # noqa: E402
from stockpulse_spark.schemas import TESTDATA_TABLES  # noqa: E402
from stockpulse_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(rows, cols):
    """Sort columns by name, then rows; stringify for stable compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                out.append(f"{v:.6f}" if not math.isnan(v) else "nan")
            else:
                out.append(str(v))
        return out

    return sorted(key(r) for r in rows)


def compare(name: str, spark, con, sf_dir: str, verbose: bool = True):
    spec = REGISTRY[name]
    t0 = time.time()
    sdf = spec.builder(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    t_spark = time.time() - t0
    if spec.oracle is None:
        return ("NO_ORACLE", name, len(srows), None, t_spark)
    t0 = time.time()
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    t_duck = time.time() - t0
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
    if not problems:
        sn = normalize([tuple(r) for r in srows], scols)
        on = normalize(orows, ocols)
        ndiff = sum(1 for a, b in zip(sn, on) if a != b)
        if ndiff:
            problems.append(f"{ndiff}/{len(sn)} rows differ")
            if verbose:
                for a, b in zip(sn, on):
                    if a != b:
                        print(f"    spark={a}\n    duck ={b}")
                        break
    status = "OK" if not problems else "MISMATCH: " + "; ".join(problems)
    return (status, name, len(srows), t_spark, t_duck)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("parity")
    con = duck_con(sf_dir)
    failures = 0
    for name in names:
        try:
            status, _, nrows, ts, td = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            status, nrows, ts, td = f"ERROR: {type(e).__name__}: {e}", -1, None, None
        flag = "✓" if status == "OK" else ("·" if status == "NO_ORACLE" else "✗")
        if flag == "✗":
            failures += 1
        ts_s = f"{ts:.2f}s" if ts else "-"
        print(f" {flag} {name:28s} rows={nrows:<8d} spark={ts_s:8s} {status if flag != '✓' else ''}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
