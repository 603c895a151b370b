"""As-of join boundary semantics: exact-timestamp match, no-prior-row
null, per-key isolation, inner variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockpulse_spark.operators.asof import asof_join


@pytest.fixture()
def sides(spark):
    trades = spark.createDataFrame(
        [
            ("A", "2024-01-02 10:00:00", 1),
            ("A", "2024-01-02 10:05:00", 2),
            ("A", "2024-01-02 09:00:00", 3),  # before any quote
            ("B", "2024-01-02 10:00:00", 4),  # B has no quotes at all
        ],
        "sym string, ts string, trade_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    quotes = spark.createDataFrame(
        [
            ("A", "2024-01-02 10:00:00", 100.0),  # exactly at trade 1
            ("A", "2024-01-02 10:03:00", 101.0),
        ],
        "sym string, qts string, px double",
    ).withColumn("qts", F.to_timestamp("qts"))
    return trades, quotes


def test_asof_semantics(sides):
    trades, quotes = sides
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="ts", right_ts="qts",
            payload_cols=["px"],
        ).collect()
    }
    assert out[1] == 100.0  # quote stamped exactly at trade time matches
    assert out[2] == 101.0  # latest prior quote
    assert out[3] is None  # no prior quote
    assert out[4] is None  # key with no right rows


def test_asof_inner(sides):
    trades, quotes = sides
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="qts",
        payload_cols=["px"], how="inner",
    ).collect()
    assert sorted(r["trade_id"] for r in out) == [1, 2]
