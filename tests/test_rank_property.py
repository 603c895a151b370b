"""Property tests for operators/rank.py — the distributed global
rank must be a permutation of 1..n that inverts to the requested sort
order, for any data distribution (including heavy ties, which stress
the range-partition boundaries)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.integers(min_value=1, max_value=120),
    st.sampled_from([2, 3, 5, 7, 10]),
)
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    """The closed form must equal Spark's own NTILE(k) for every
    (N, k) — including N < k, N divisible by k, and the mixed
    ceil/floor bucket boundary."""
    from pyspark.sql import functions as F

    from stockpulse_spark.operators.rank import ntile_from_rank

    df = spark.range(1, n + 1).select(F.col("id").alias("rnk"))
    got = {
        r["rnk"]: r["b"]
        for r in df.select(
            "rnk",
            ntile_from_rank(F.col("rnk"), F.lit(n).cast("long"), k).alias("b"),
        ).collect()
    }
    want = {
        r["rnk"]: r["b"]
        for r in df.select(
            "rnk",
            F.ntile(k).over(Window.orderBy("rnk")).alias("b"),
        ).collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),  # NULL is a real group
            st.integers(min_value=-3, max_value=3),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_grouped_global_rank_matches_window_row_number(spark, rows):
    """with_grouped_global_rank must equal
    row_number() OVER (PARTITION BY g ORDER BY x, id) for any data —
    including NULL groups (null-safe offsets join) and heavy ties
    (range-boundary stress)."""
    from pyspark.sql import functions as F

    from stockpulse_spark.operators.rank import with_grouped_global_rank

    df = spark.createDataFrame(
        [(i, g, x) for i, (g, x) in enumerate(rows)],
        "id long, g string, x long",
    )
    got = {
        r["id"]: r["rnk"]
        for r in with_grouped_global_rank(df, ["g"], "x", "id").collect()
    }
    want = {
        r["id"]: r["rnk"]
        for r in df.select(
            "id",
            F.row_number()
            .over(
                Window.partitionBy("g").orderBy(
                    F.col("x").asc_nulls_last(), "id"
                )
            )
            .alias("rnk"),
        ).collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.sampled_from([0, 1, 2, 5, None]),  # NULL values skipped
        ),
        min_size=1,
        max_size=200,
    ),
    st.booleans(),
)
def test_grouped_running_sum_matches_window(spark, rows, inclusive):
    """with_grouped_running_sum must equal coalesce(SUM() OVER
    (PARTITION BY g ORDER BY id ROWS UNBOUNDED PRECEDING .. 0|-1), 0)
    for any data — NULL groups, NULL values, either frame bound."""
    from pyspark.sql import functions as F

    from stockpulse_spark.operators.rank import with_grouped_running_sum

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "id long, g string, v long",
    )
    got = {
        r["id"]: r["cs"]
        for r in with_grouped_running_sum(
            df, ["g"], ["id"], "v", out_col="cs", inclusive=inclusive
        ).collect()
    }
    upper = 0 if inclusive else -1
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    want = {
        r["id"]: r["cs"]
        for r in df.select(
            "id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("cs")
        ).collect()
    }
    assert got == want
