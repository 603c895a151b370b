"""Property tests for operators/rank.py — the distributed global
rank must be a permutation of 1..n that inverts to the requested sort
order, for any data distribution (including heavy ties, which stress
the range-partition boundaries)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stockpulse_spark.operators.rank import with_global_rank


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-5, max_value=5),  # heavy ties on purpose
        min_size=1,
        max_size=300,
    )
)
def test_global_rank_is_exact_permutation(spark, xs):
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "id long, x long"
    )
    out = with_global_rank(df, "x", "id").collect()
    assert sorted(r["rnk"] for r in out) == list(range(1, len(xs) + 1))
    # rank order == (x, id) lexicographic order
    by_rank = sorted(out, key=lambda r: r["rnk"])
    keys = [(r["x"], r["id"]) for r in by_rank]
    assert keys == sorted(keys)


def test_global_rank_single_row(spark):
    df = spark.createDataFrame([(1, 42)], "id long, x long")
    assert with_global_rank(df, "x", "id").first()["rnk"] == 1
