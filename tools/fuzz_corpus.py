"""Adversarial parity corpus — a mutated copy of an sf dir that stress-
tests the ENGINE-SEMANTIC edges where Spark and DuckDB are allowed to
disagree unless the query pins them down:

- duplicate (user_id, ts) event rows   -> window/rank tie handling
- NULL `value` / NULL `event_type`     -> NULL ordering (Spark ASC is
  NULLS FIRST, DuckDB NULLS LAST), NULL-skipping aggs, COUNT(*) vs
  COUNT(col)
- -0.0 and rounding-boundary values    -> IEEE sign / HALF_UP drift
- NULL / empty / one-word / '|'-bearing / unicode / shared-boilerplate
  document text                        -> tokenizer edges, delimiter
  injection, LSH hot buckets
- all-zero embedding vectors           -> cosine divide-by-zero

Every registry query must STILL hash-match its DuckDB oracle on this
corpus: the two engines read identical bytes, so any divergence is a
latent data-dependent parity bug of exactly the class round-4/5
advisories kept finding (asc_nulls_last, -0.0, ANSI divide).

Usage: python tools/fuzz_corpus.py [src_sf_dir] [dest_dir]
       python tools/parity.py --jobs=6 <dest_dir>

Mutations are deterministic (hash-of-id based, no RNG state) so the
corpus is reproducible and the sweep is re-runnable bit-for-bit.
Untouched tables are passed through unchanged so every query can run.
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BOILER = (
    "all content on this page is provided as is without warranty of "
    "any kind either express or implied see the license file for the "
    "full terms and conditions of use " * 3
)
PIPE_TEXT = (
    "the quick|brown fox | jumps||over the lazy dog while a|b c|d "
    "tokens carry pipes into every shingle and pair delimiter"
)
UNICODE_TEXT = (
    "naïve résumé 中文分词 straße "
    "élève coopération 日本語 한국어 "
    "emoji \U0001f600 mixed with plain ascii words for the tokenizer"
)


def _nan_on() -> bool:
    """The NaN class is part of the standard gate (round-6 campaign);
    SPARK_GRAFT_FUZZ_NAN=0 isolates it for bisecting."""
    return os.environ.get("SPARK_GRAFT_FUZZ_NAN", "1") != "0"


def _inf_on() -> bool:
    """The ±Infinity class (round-7 campaign; same contract as NaN —
    non-finite masks like NULL). SPARK_GRAFT_FUZZ_INF=0 isolates it."""
    return os.environ.get("SPARK_GRAFT_FUZZ_INF", "1") != "0"


def mutate_events(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["event_id"])
    # 1) duplicate every 47th row EXACTLY (same event_id/user_id/ts):
    #    any ROW_NUMBER over a non-total order must still agree
    dup_idx = list(range(0, n, 47))
    for k in d:
        d[k] = list(d[k]) + [d[k][i] for i in dup_idx]
    m = len(d["event_id"])
    for i in range(m):
        eid = d["event_id"][i] if d["event_id"][i] is not None else i
        h = (eid * 2654435761) % 1000
        # 2) NULL value on ~3%
        if h < 30:
            d["value"][i] = None
        # 3) -0.0 on a few (toggle: SPARK_GRAFT_FUZZ_NEGZERO=0 to
        #    isolate the NULL/zero classes from the signed-zero class)
        elif h < 35:
            import os
            if os.environ.get("SPARK_GRAFT_FUZZ_NEGZERO", "1") != "0":
                d["value"][i] = -0.0
        # 4) exact small integers including true zero (divide hazards).
        #    NOT .5-at-6dp boundary values: round(2.4999999999999998e-6)
        #    legitimately differs between Spark (shortest-decimal
        #    HALF_UP -> 2e-6) and DuckDB (binary value -> 3e-6) — an
        #    irreducible 1-ulp ambiguity, not a query bug.
        elif h < 40:
            d["value"][i] = float(eid % 3)
        # 4b) NaN measures (~0.5%): part of the standard gate since
        #     the round-6 NaN campaign closed all 42 divergences (the
        #     nan_nn contract: NaN ticks mask like NULL at every
        #     measure read, cents snap, bar boundary, and moment
        #     aggregate). SPARK_GRAFT_FUZZ_NAN=0 isolates the class.
        elif 40 <= h < 45:
            import os as _os  # local: the -0.0 branch shadows `os`

            if _os.environ.get("SPARK_GRAFT_FUZZ_NAN", "1") != "0":
                d["value"][i] = float("nan")
        # 4c) ±Infinity measures (~0.5%): part of the standard gate
        #     since the round-7 inf campaign (an upstream division
        #     can emit inf, and inf shares NaN's hazards — CAST
        #     overflow on cents snaps, DuckDB moment-aggregate
        #     raises, inf-inf = NaN inside deltas; census found 33,
        #     the nan_nn/isfinite contract widening closed all).
        #     SPARK_GRAFT_FUZZ_INF=0 isolates the class.
        elif 45 <= h < 50 and _inf_on():
            d["value"][i] = float("inf") if eid % 2 else float("-inf")
        # 5) NULL event_type on ~1%
        if 990 <= h:
            d["event_type"][i] = None
    return pa.table(d, schema=tbl.schema)


def mutate_documents(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["doc_id"])
    for i in range(n):
        did = d["doc_id"][i]
        h = (did * 2654435761) % 1000
        if h < 20:
            d["text"][i] = None  # NULL text
        elif h < 40:
            d["text"][i] = ""  # empty text
        elif h < 60:
            d["text"][i] = "solitary"  # below every n-gram threshold
        elif h < 80:
            d["text"][i] = PIPE_TEXT  # delimiter injection
        elif h < 100:
            d["text"][i] = UNICODE_TEXT  # non-ascii tokens
        elif h < 150:
            d["text"][i] = BOILER  # one shared text, ~5% of corpus
        if d["text"][i] is not None:
            d["n_chars"][i] = len(d["text"][i])
        else:
            d["n_chars"][i] = None
    return pa.table(d, schema=tbl.schema)


def mutate_embeddings(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["vec_id"])
    dim = len(d["embedding"][0])
    for i in range(n):
        vid = d["vec_id"][i]
        h = (vid * 2654435761) % 1000
        if h < 20:
            # all-zero vector: norm 0 -> cosine must not divide-by-zero
            d["embedding"][i] = [0.0] * dim
        elif h < 30:
            # NULL vector: must flow as NULL cosine/bucket, never crash
            d["embedding"][i] = None
        elif h < 35 and _nan_on():
            # one NaN element: folds/norms go NaN — both engines must
            # route it identically (rank positions, guards)
            v = list(d["embedding"][i])
            v[vid % dim] = float("nan")
            d["embedding"][i] = v
        elif h < 38 and _inf_on():
            # one ±inf element: corrupt upload, excluded like NaN/NULL
            v = list(d["embedding"][i])
            v[vid % dim] = float("inf") if vid % 2 else float("-inf")
            d["embedding"][i] = v
    return pa.table(d, schema=tbl.schema)


def mutate_lineitem(tbl: pa.Table) -> pa.Table:
    """TPC-H data is NOT NULL by spec, but a 100 TB lake ingested from
    real feeds is not: plant NULL measures, NULL group keys, NULL
    dates, zero/negative-zero prices, and exact duplicate lines so the
    warehouse queries are held to the same NULL-ordering / NULL-
    skipping / signed-zero parity contract as the events table."""
    d = tbl.to_pydict()
    n = len(d["l_orderkey"])
    # exact duplicate of every 61st line (same orderkey/linenumber):
    # aggregates must agree on the doubled weight in both engines
    dup_idx = list(range(0, n, 61))
    for k in d:
        d[k] = list(d[k]) + [d[k][i] for i in dup_idx]
    m = len(d["l_orderkey"])
    for i in range(m):
        h = ((d["l_orderkey"][i] * 31 + d["l_linenumber"][i])
             * 2654435761) % 1000
        if h < 15:
            d["l_quantity"][i] = None  # NULL measure
        elif h < 25:
            d["l_extendedprice"][i] = None
        elif h < 30:
            d["l_discount"][i] = None
        elif h < 35:
            d["l_discount"][i] = -0.0  # signed zero through revenue math
        elif h < 40:
            d["l_extendedprice"][i] = 0.0  # zero price: ratio hazards
        elif h < 45:
            d["l_shipdate"][i] = None  # NULL date -> NULL trunc keys
        elif h < 48 and _nan_on():
            d["l_extendedprice"][i] = float("nan")  # NaN money
        elif h < 50 and _inf_on():
            d["l_extendedprice"][i] = float("inf")  # inf money
        if 990 <= h:
            d["l_returnflag"][i] = None  # NULL group/order key
        elif 980 <= h < 990:
            d["l_linestatus"][i] = None
    return pa.table(d, schema=tbl.schema)


def mutate_orders(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["o_orderkey"])
    for i in range(n):
        h = (d["o_orderkey"][i] * 2654435761) % 1000
        if h < 15:
            d["o_totalprice"][i] = None
        elif h < 20:
            d["o_totalprice"][i] = -0.0
        elif h < 25:
            d["o_orderdate"][i] = None
        elif h < 28 and _nan_on():
            d["o_totalprice"][i] = float("nan")
        elif h < 30 and _inf_on():
            d["o_totalprice"][i] = float("-inf")
        if 990 <= h:
            d["o_orderpriority"][i] = None
        elif 985 <= h < 990:
            d["o_orderstatus"][i] = None
    return pa.table(d, schema=tbl.schema)


def mutate_customer(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["c_custkey"])
    for i in range(n):
        h = (d["c_custkey"][i] * 2654435761) % 1000
        if h < 20:
            d["c_acctbal"][i] = None
        elif h < 25:
            d["c_acctbal"][i] = -0.0
        elif h < 28 and _nan_on():
            d["c_acctbal"][i] = float("nan")
        elif h < 30 and _inf_on():
            d["c_acctbal"][i] = float("inf")
        if 990 <= h:
            d["c_mktsegment"][i] = None
    return pa.table(d, schema=tbl.schema)


def mutate_part(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["p_partkey"])
    for i in range(n):
        h = (d["p_partkey"][i] * 2654435761) % 1000
        if h < 15:
            d["p_retailprice"][i] = None
        elif h < 20:
            d["p_retailprice"][i] = -0.0
        if 990 <= h:
            d["p_type"][i] = None  # NULL dim attribute through joins
        elif 985 <= h < 990:
            d["p_brand"][i] = None
        elif 980 <= h < 985:
            d["p_size"][i] = None
    return pa.table(d, schema=tbl.schema)


def mutate_supplier(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["s_suppkey"])
    for i in range(n):
        h = (d["s_suppkey"][i] * 2654435761) % 1000
        if h < 30:
            d["s_acctbal"][i] = None
        elif h < 40:
            d["s_acctbal"][i] = -0.0
    return pa.table(d, schema=tbl.schema)


MUTATORS = {
    "events": mutate_events,
    "documents": mutate_documents,
    "embeddings": mutate_embeddings,
    "lineitem": mutate_lineitem,
    "orders": mutate_orders,
    "customer": mutate_customer,
    "part": mutate_part,
    "supplier": mutate_supplier,
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fuzz_" + Path(src).name
    os.makedirs(dst, exist_ok=True)
    for f in sorted(Path(src).glob("*.parquet")):
        name = f.stem
        out = Path(dst) / f.name
        if name in MUTATORS:
            tbl = pq.read_table(f)
            mut = MUTATORS[name](tbl)
            pq.write_table(mut, out)
            print(f"mutated   {name}: {len(tbl)} -> {len(mut)} rows")
        else:
            if out.exists() or out.is_symlink():
                out.unlink()
            shutil.copyfile(f, out)
            print(f"passthru  {name}")
    print(dst)


if __name__ == "__main__":
    main()
