"""Accuracy contracts for the approximate aggregates — the sketches'
outputs are implementation-defined (no DuckDB oracle possible), so the
guarantee each sketch documents is asserted directly against the exact
twin computed on the same data."""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from collections import defaultdict

from pyspark.sql import functions as F

from stockpulse_spark.plans import REGISTRY
from stockpulse_spark.sources.tables import load_table
from tests.conftest import SF_DIR

ACCURACY = 10_000  # must match q_value_percentiles_approx
RSD = 0.02  # must match q_distinct_users_approx


def test_approx_percentile_rank_error(spark):
    """approx_percentile guarantees the returned value's RANK is within
    n/accuracy of the target rank — check exactly that, per group."""
    vals = defaultdict(list)
    for r in load_table(spark, SF_DIR, "events").select("event_type", "value").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(r["value"])
    for v in vals.values():
        v.sort()

    approx = REGISTRY["value_percentiles_approx"].builder(spark, SF_DIR).collect()
    assert {r["event_type"] for r in approx} == set(vals)
    for row in approx:
        v = vals[row["event_type"]]
        n = len(v)
        for q in (0.25, 0.50, 0.75, 0.99):
            got = row[f"p{int(q * 100)}"]
            # the query rounds to 6dp; rank-bracket with that slack
            lo = bisect_left(v, got - 1e-6)
            hi = bisect_right(v, got + 1e-6)
            target = q * (n - 1)
            tol = n / ACCURACY + 2
            assert lo - tol <= target <= hi + tol, (
                f"{row['event_type']} p{int(q*100)}: value {got} has rank "
                f"[{lo},{hi}), target {target:.1f}, n={n}"
            )


def test_approx_count_distinct_relative_error(spark):
    exact = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["distinct_users_by_type"].builder(spark, SF_DIR).collect()
    }
    approx = REGISTRY["distinct_users_approx"].builder(spark, SF_DIR).collect()
    assert {r["event_type"] for r in approx} == set(exact)
    for row in approx:
        e = exact[row["event_type"]]
        rel = abs(row["approx_users"] - e) / max(e, 1)
        # 5×rsd is a generous envelope (HLL++ error is ~normal with
        # sd=rsd; 5 sigma won't flake)
        assert rel <= 5 * RSD, f"{row['event_type']}: {row['approx_users']} vs {e}"


def test_cms_never_underestimates(spark):
    """Count-min guarantee: estimate >= true count, always."""
    rows = REGISTRY["term_counts_cms"].builder(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_estimate"] >= r["true_tf"], r
        assert r["overestimate"] == r["cms_estimate"] - r["true_tf"]


def test_sketch_rollup_matches_exact_monthly_distinct(spark):
    """Merged weekly HLL sketches estimate the month's exact distinct
    user count within HLL error (default lgConfigK=12 → rsd ≈ 1.6%;
    asserted within 5× that)."""
    approx = {
        r["mo"]: r["approx_users"]
        for r in REGISTRY["distinct_users_sketch_rollup"]
        .builder(spark, SF_DIR)
        .collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["mo"]: r["n"]
        for r in ev.select(
            F.date_trunc("month", F.date_trunc("week", "ts")).alias("mo"),
            "user_id",
        )
        .groupBy("mo")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for mo, est in approx.items():
        assert abs(est - exact[mo]) <= max(1, 0.08 * exact[mo]), (
            mo,
            est,
            exact[mo],
        )
