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


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-5, max_value=5),
        min_size=1,
        max_size=300,
    )
)
def test_global_rank_desc_prefix(spark, xs):
    """A "-col" key orders DESC NULLS LAST: rank order must invert to
    (-x, id) — i.e. descending x with ascending id tiebreak."""
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "id long, x long"
    )
    out = with_global_rank(df, "-x", "id").collect()
    assert sorted(r["rnk"] for r in out) == list(range(1, len(xs) + 1))
    by_rank = sorted(out, key=lambda r: r["rnk"])
    keys = [(-r["x"], r["id"]) for r in by_rank]
    assert keys == sorted(keys)


def test_global_rank_desc_nan_first_null_last(spark):
    """DESC NULLS LAST with doubles: NaN ranks FIRST (it is the
    largest double in both engines' DESC order), NULL ranks LAST —
    exactly why "-col" exists instead of negating the key (-NaN is
    still NaN and would have sent it to the bottom)."""
    rows = [(1, 2.0), (2, float("nan")), (3, None), (4, 5.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = {r["id"]: r["rnk"] for r in with_global_rank(df, "-x", "id").collect()}
    assert out[2] == 1  # NaN first under DESC
    assert out[4] == 2  # 5.0
    assert out[1] == 3  # 2.0
    assert out[3] == 4  # NULL last
