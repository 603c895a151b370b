"""Trading-calendar operators (reference P10 + J2).

The reference uses pandas' USFederalHolidayCalendar inside a per-row
Python `map` (src/preprocessing/preprocessing_pipeline.py:80-103,
195-198). A per-row UDF would serialize every row through Python; at
scale the right shape is a tiny generated holiday DIMENSION plus a
broadcast anti-join — the calendar is data, not code.

`us_federal_holidays` generates observed federal holiday dates
deterministically from the statutory rules (public knowledge), so no
external library is needed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.localrel import values_df


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> dt.date:
    """n-th (1-based) `weekday` (Mon=0) of a month; n=-1 → last."""
    if n > 0:
        d = dt.date(year, month, 1)
        offset = (weekday - d.weekday()) % 7
        return d + dt.timedelta(days=offset + 7 * (n - 1))
    d = dt.date(year + (month == 12), (month % 12) + 1, 1) - dt.timedelta(days=1)
    offset = (d.weekday() - weekday) % 7
    return d - dt.timedelta(days=offset)


def _observed(d: dt.date) -> dt.date:
    # federal observation shift: Sat → Fri, Sun → Mon
    if d.weekday() == 5:
        return d - dt.timedelta(days=1)
    if d.weekday() == 6:
        return d + dt.timedelta(days=1)
    return d


def us_federal_holiday_dates(years: list[int]) -> list[tuple[dt.date, str]]:
    out: list[tuple[dt.date, str]] = []
    for y in years:
        out += [
            (_observed(dt.date(y, 1, 1)), "New Year's Day"),
            (_nth_weekday(y, 1, 0, 3), "Martin Luther King Jr. Day"),
            (_nth_weekday(y, 2, 0, 3), "Washington's Birthday"),
            (_nth_weekday(y, 5, 0, -1), "Memorial Day"),
            (_observed(dt.date(y, 6, 19)), "Juneteenth"),
            (_observed(dt.date(y, 7, 4)), "Independence Day"),
            (_nth_weekday(y, 9, 0, 1), "Labor Day"),
            (_nth_weekday(y, 10, 0, 2), "Columbus Day"),
            (_observed(dt.date(y, 11, 11)), "Veterans Day"),
            (_nth_weekday(y, 11, 3, 4), "Thanksgiving Day"),
            (_observed(dt.date(y, 12, 25)), "Christmas Day"),
        ]
    return sorted(out)


def us_federal_holidays(spark: SparkSession, years: list[int]) -> DataFrame:
    """Holiday dimension: (holiday_date DATE, holiday_name STRING).

    A VALUES LocalRelation (functions/localrel.py), not
    createDataFrame: the dimension is embedded in many query plans and
    the pickled-RDD path paid one Python-worker task per partition on
    every action (optimization r11).
    """
    rows = [(d, n) for d, n in us_federal_holiday_dates(years)]
    return values_df(spark, rows, ["holiday_date", "holiday_name"])


def market_hours_filter(
    df: DataFrame,
    holidays: DataFrame | None = None,
    ts_col: str = "timestamp",
    open_minutes: int = 9 * 60 + 30,
    close_minutes: int = 16 * 60,
) -> DataFrame:
    """Keep Mon-Fri 09:30-16:00 bars, excluding holiday dates
    (reference preprocessing_pipeline.py:80-103). The weekday/time
    predicate is a codegen'd filter; the holiday exclusion is a
    broadcast LEFT ANTI join against the generated dimension — no
    Python in the row path.

    NOTE the reference treats ingested timestamps as already
    exchange-local (tz-naive, interpreted US/Eastern); we keep that
    contract and compare wall-clock fields directly.
    """
    ts = F.col(ts_col)
    minutes = F.hour(ts) * 60 + F.minute(ts)
    out = df.filter(
        (F.dayofweek(ts).isin(2, 3, 4, 5, 6))  # Mon..Fri (Sunday=1)
        & (minutes >= open_minutes)
        & (minutes < close_minutes)
    )
    if holidays is not None:
        out = out.join(
            F.broadcast(holidays.select(F.col("holiday_date"))),
            on=F.to_date(ts) == F.col("holiday_date"),
            how="left_anti",
        )
    return out


def missing_slots_report(
    df: DataFrame,
    ts_col: str = "timestamp",
    partition_col: str = "symbol",
    freq_minutes: int = 5,
    open_minutes: int = 9 * 60 + 30,
    close_minutes: int = 16 * 60,
    holidays: DataFrame | None = None,
) -> DataFrame:
    """Expected 5-min grid minus observed slots → missing slots per
    (partition, date) (reference J2: preprocessing_pipeline.py:213-255).

    Grid generation is `sequence()` + `explode` — distributed, no
    driver-side loop. Observed slots are anti-joined away; the result
    aggregates to collect_list per day like the reference's report.
    """
    spark = df.sparkSession
    days = (
        df.select(
            F.col(partition_col).alias("pkey"), F.to_date(F.col(ts_col)).alias("d")
        )
        .distinct()
        .filter(F.dayofweek(F.col("d")).isin(2, 3, 4, 5, 6))
    )
    if holidays is not None:
        days = days.join(
            F.broadcast(holidays),
            on=days["d"] == holidays["holiday_date"],
            how="left_anti",
        )
    n_slots = (close_minutes - open_minutes) // freq_minutes
    grid = days.select(
        "pkey",
        "d",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_slots - 1))
        ).alias("i"),
    ).select(
        "pkey",
        "d",
        (
            F.to_timestamp(F.col("d"))
            + F.make_interval(mins=F.lit(open_minutes) + F.col("i") * freq_minutes)
        ).alias("slot_ts"),
    )
    observed = df.select(
        F.col(partition_col).alias("pkey"), F.col(ts_col).alias("slot_ts")
    ).distinct()
    missing = grid.join(observed, on=["pkey", "slot_ts"], how="left_anti")
    return (
        missing.groupBy("pkey", "d")
        .agg(
            F.count(F.lit(1)).alias("n_missing"),
            F.sort_array(F.collect_list(F.date_format("slot_ts", "HH:mm:ss"))).alias(
                "missing_times"
            ),
        )
        .withColumnRenamed("pkey", partition_col)
        .withColumnRenamed("d", "date")
    )
