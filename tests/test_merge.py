"""merge_upsert: action labeling, winner choice, tie handling, and
schema guard — the MERGE semantics a transactional format would give,
verified on planted rows."""

from __future__ import annotations

import pytest

from stockpulse_spark.operators.merge import merge_upsert


def _rows(df):
    return {
        r.k: (r.v, r.ver, r["__merge_action"]) for r in df.collect()
    }


def test_merge_actions_and_winners(spark):
    target = spark.createDataFrame(
        [(1, "t1", 10), (2, "t2", 20), (3, "t3", 30)], "k: int, v: string, ver: int"
    )
    source = spark.createDataFrame(
        [(2, "s2", 25), (3, "s3-old", 5), (4, "s4", 40)],
        "k: int, v: string, ver: int",
    )
    got = _rows(merge_upsert(target, source, keys=["k"], order_by="ver"))
    assert got[1] == ("t1", 10, "keep")        # unmatched target
    assert got[2] == ("s2", 25, "update")      # source newer
    assert got[3] == ("t3", 30, "keep")        # source OLDER -> target kept
    assert got[4] == ("s4", 40, "insert")      # unmatched source


def test_merge_tie_goes_to_source(spark):
    target = spark.createDataFrame([(1, "t", 7)], "k: int, v: string, ver: int")
    source = spark.createDataFrame([(1, "s", 7)], "k: int, v: string, ver: int")
    got = _rows(merge_upsert(target, source, keys=["k"], order_by="ver"))
    assert got[1] == ("s", 7, "update")


def test_merge_schema_mismatch_raises(spark):
    a = spark.createDataFrame([(1, 1)], "k: int, ver: int")
    b = spark.createDataFrame([(1, 1, "x")], "k: int, ver: int, v: string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(a, b, keys=["k"], order_by="ver")


def test_merge_property_vs_dict_model(spark):
    """merge_upsert agrees with the obvious dict model (newer-or-tie
    source wins, unmatched rows pass through) on generated batches."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows = st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 20)),
        min_size=0, max_size=25,
    )

    @given(t=rows, s=rows)
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(t, s):
        # one row per key per side (the operator's target/source contract)
        tm = {k: v for k, v in t}
        sm = {k: v for k, v in s}
        expect = dict(tm)
        for k, v in sm.items():
            if k not in expect or v >= expect[k]:
                expect[k] = v
        tdf = spark.createDataFrame(
            list(tm.items()) or [(None, None)], "k: int, ver: int"
        ).filter("k IS NOT NULL")
        sdf = spark.createDataFrame(
            list(sm.items()) or [(None, None)], "k: int, ver: int"
        ).filter("k IS NOT NULL")
        got = {
            r.k: r.ver
            for r in merge_upsert(tdf, sdf, keys=["k"], order_by="ver").collect()
        }
        assert got == expect

    run()
