"""Unit tests for the quality/validation operators (reference P6-P11)
not otherwise pinned by the oracle-parity suite."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from stockpulse_spark.operators.calendar import us_federal_holiday_dates
from stockpulse_spark.operators.quality import (
    SchemaValidationError,
    bounded_ffill,
    clean_bars,
    ensure_columns,
    scrub_non_finite,
    validate_required_columns,
)


@pytest.fixture()
def bars(spark):
    rows = [
        ("2024-01-02 09:30:00", "AAPL", 10.0, 12.0, 9.0, 11.0, 100),
        ("2024-01-02 09:35:00", "AAPL", 11.0, 13.0, 10.0, 12.0, 200),
        ("2024-01-02 09:35:00", "AAPL", 11.0, 13.0, 10.0, 12.0, 200),  # dup
        ("2024-01-02 09:40:00", "AAPL", None, 13.0, 10.0, 12.0, 150),  # null
        ("2024-01-02 09:45:00", "AAPL", -1.0, 13.0, 10.0, 12.0, 150),  # neg
        ("2024-01-02 09:50:00", "AAPL", 11.0, 9.0, 10.0, 12.0, 150),  # hi<lo
    ]
    return spark.createDataFrame(
        rows,
        "timestamp string, symbol string, open double, high double, low double, close double, volume long",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))


def test_clean_bars_gate(bars):
    out = clean_bars(bars).collect()
    # dup collapsed, null/negative/inconsistent rows dropped
    assert len(out) == 2
    assert all(r["high"] >= r["low"] and r["open"] > 0 for r in out)


def test_validate_and_ensure_columns(bars):
    validate_required_columns(bars, ["timestamp", "symbol", "close"])
    with pytest.raises(SchemaValidationError):
        validate_required_columns(bars, ["timestamp", "nope"])
    out = ensure_columns(bars, ["symbol", "close", "extra_col"])
    assert out.columns == ["symbol", "close", "extra_col"]
    assert out.select("extra_col").distinct().collect()[0][0] is None


def test_scrub_non_finite(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf",),), (-float("inf"),)], "x double"
    )
    vals = [r["x"] for r in scrub_non_finite(df, ["x"]).collect()]
    assert vals[0] == 1.0 and all(v is None for v in vals[1:])


def test_scrub_non_finite_normalizes_signed_zero(spark):
    """-0.0 must leave bronze as +0.0: it survives parquet, fails
    Spark's pushed-down equality filter, and hash-renders as '-0.0'
    downstream (round-6 fuzz finding)."""
    df = spark.createDataFrame([(-0.0,), (0.0,), (-2.5,)], "x double")
    vals = [r["x"] for r in scrub_non_finite(df, ["x"]).collect()]
    assert [str(v) for v in vals] == ["0.0", "0.0", "-2.5"]


def test_bounded_ffill_run_length(spark):
    rows = [(i, None if 2 <= i <= 6 else float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "i long, x double").withColumn(
        "g", F.lit("a")
    )
    out = bounded_ffill(df, ["x"], ["g"], ["i"], limit=3).orderBy("i").collect()
    got = [r["x"] for r in out]
    # run of 5 nulls at i=2..6: only the first 3 fill (pandas limit=3)
    assert got == [0.0, 1.0, 1.0, 1.0, 1.0, None, None, 7.0, 8.0, 9.0]


def test_holiday_generator_known_dates():
    d = dict(
        (n, dt) for dt, n in us_federal_holiday_dates([2024])
    )
    import datetime

    assert d["New Year's Day"] == datetime.date(2024, 1, 1)
    assert d["Martin Luther King Jr. Day"] == datetime.date(2024, 1, 15)
    assert d["Memorial Day"] == datetime.date(2024, 5, 27)
    assert d["Thanksgiving Day"] == datetime.date(2024, 11, 28)
    # 2022 July 4 fell on Monday (no shift); 2026 falls Saturday → observed Friday
    d26 = dict((n, dt) for dt, n in us_federal_holiday_dates([2026]))
    assert d26["Independence Day"] == datetime.date(2026, 7, 3)
