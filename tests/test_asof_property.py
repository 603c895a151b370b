"""Property test: asof_join must agree with pandas.merge_asof
(backward direction, exact matches allowed — the same semantics) on
arbitrary generated trade/quote tapes."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stockpulse_spark.operators.asof import asof_join
from stockpulse_spark.operators.skew import salted_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

tape = st.tuples(
    st.lists(  # trades: (key, ts-offset)
        st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 500)),
        min_size=1,
        max_size=30,
    ),
    st.lists(  # quotes: (key, ts-offset, px)
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(0, 500),
            st.floats(1, 100, allow_nan=False),
        ),
        min_size=0,
        max_size=30,
        unique_by=lambda q: (q[0], q[1]),  # one quote per (key, ts)
    ),
)


@given(t=tape)
@settings(**_SETTINGS)
def test_asof_matches_pandas_merge_asof(spark, t):
    trades_raw, quotes_raw = t
    trades = spark.createDataFrame(
        [(s, o, i) for i, (s, o) in enumerate(trades_raw)],
        "sym string, off long, trade_id long",
    ).withColumn("ts", F.timestamp_seconds(F.col("off")))
    quotes = spark.createDataFrame(
        [(s, o, px) for s, o, px in quotes_raw] or [("Z", 0, 0.0)],
        "sym string, off long, px double",
    ).withColumn("qts", F.timestamp_seconds(F.col("off")))

    got = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades.select("sym", "ts", "trade_id"),
            quotes.select("sym", "qts", "px"),
            on=["sym"],
            left_ts="ts",
            right_ts="qts",
            payload_cols=["px"],
        ).collect()
    }

    tp = pd.DataFrame(
        [(s, o, i) for i, (s, o) in enumerate(trades_raw)],
        columns=["sym", "ts", "trade_id"],
    ).sort_values(["ts", "trade_id"])
    qp = pd.DataFrame(
        [(s, o, px) for s, o, px in quotes_raw] or [("Z", 0, 0.0)],
        columns=["sym", "ts", "px"],
    ).sort_values(["ts", "sym"])
    exp_df = pd.merge_asof(tp, qp, on="ts", by="sym", direction="backward")
    exp = {
        int(r.trade_id): (None if pd.isna(r.px) else r.px)
        for r in exp_df.itertuples()
    }
    assert got == exp


@given(t=tape)
@settings(**_SETTINGS)
def test_salted_join_equals_plain(spark, t):
    trades_raw, quotes_raw = t
    l = spark.createDataFrame(
        [(s, o) for s, o in trades_raw], "sym string, off long"
    )
    r = spark.createDataFrame(
        [(s, px) for s, _, px in quotes_raw] or [("Z", 0.0)], "sym string, px double"
    ).dropDuplicates(["sym", "px"])
    plain = sorted(map(tuple, l.join(r, "sym").collect()))
    salted = sorted(map(tuple, salted_join(l, r, ["sym"], n_salts=4).collect()))
    assert plain == salted
