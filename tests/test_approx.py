"""Accuracy contracts for the approximate aggregates — the sketches'
outputs are implementation-defined (no DuckDB oracle possible), so the
guarantee each sketch documents is asserted directly against the exact
twin computed on the same data."""

from __future__ import annotations

from bisect import bisect_left, bisect_right

from pyspark.sql import functions as F

from stockpulse_spark.plans import REGISTRY
from stockpulse_spark.sources.tables import load_table
from tests.conftest import SF_DIR

ACCURACY = 10_000  # must match q_value_percentiles_approx
RSD = 0.02  # must match q_distinct_users_approx


def test_approx_percentile_rank_error(spark):
    """The query now CERTIFIES the GK rank guarantee itself (the
    boolean the driver hashes); this test independently recomputes the
    certificate for one group so a bug in the in-plan rank check can't
    self-confirm."""
    rows = REGISTRY["value_percentiles_approx"].builder(spark, SF_DIR).collect()
    assert rows, "no groups"
    assert all(r["within_gk_bound"] for r in rows), [
        (r["event_type"], r["q"]) for r in rows if not r["within_gk_bound"]
    ]
    # independent recomputation: raw approx_percentile vs sorted values
    ev = load_table(spark, SF_DIR, "events")
    etype = rows[0]["event_type"]
    vals = sorted(
        r["value"]
        for r in ev.filter(F.col("event_type") == etype).select("value").collect()
        if r["value"] is not None
    )
    got = (
        ev.filter(F.col("event_type") == etype)
        .agg(
            F.expr(
                f"approx_percentile(value, array(0.25D, 0.5D, 0.75D, 0.99D), {ACCURACY})"
            ).alias("ps")
        )
        .first()["ps"]
    )
    n = len(vals)
    for q, p in zip((0.25, 0.50, 0.75, 0.99), got):
        lo = bisect_left(vals, p)
        hi = bisect_right(vals, p)
        target = q * (n - 1)
        tol = n / ACCURACY + 2
        assert lo - tol <= target <= hi + tol, (q, p, lo, hi, target, n)


def test_approx_count_distinct_relative_error(spark):
    exact = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["distinct_users_by_type"].builder(spark, SF_DIR).collect()
    }
    approx = REGISTRY["distinct_users_approx"].builder(spark, SF_DIR).collect()
    assert {r["event_type"] for r in approx} == set(exact)
    for row in approx:
        # the exact twin inside the query must agree with the
        # standalone exact query, and the 5×rsd certificate must hold
        # (HLL++ error is ~normal with sd=rsd; 5 sigma won't flake)
        assert row["exact_users"] == exact[row["event_type"]]
        assert row["approx_within_5rsd"], row


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
    certified within 5× that by the query's own boolean, cross-checked
    here against an independently computed exact count)."""
    rows = {
        r["mo"]: r
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
    assert set(rows) == set(exact)
    for mo, r in rows.items():
        assert r["exact_users"] == exact[mo], (mo, r)
        assert r["merged_within_8pct"], r
