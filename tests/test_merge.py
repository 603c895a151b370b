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
