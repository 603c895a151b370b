"""Calendar / imputation query registrations (reference P6, P10, W14, J2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.operators.calendar import (
    market_hours_filter,
    us_federal_holiday_dates,
    us_federal_holidays,
)
from stockpulse_spark.operators.quality import bounded_ffill, ffill_bfill
from stockpulse_spark.plans.registry import _r6, _register, _t

_HOLIDAY_YEARS = list(range(2020, 2031))
_HOLIDAY_LITERALS = ", ".join(
    f"DATE '{d.isoformat()}'" for d, _ in us_federal_holiday_dates(_HOLIDAY_YEARS)
)


@_register(
    "ffill_bfill",
    oracle="""
    WITH m AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
      FROM events
    )
    SELECT event_id, user_id, ts,
           ROUND(COALESCE(
             last_value(value IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             first_value(value IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           ), 6) AS value_filled
    FROM m
    """,
    tags=("window", "imputation"),
    doc="reference P6 (app/dashboard.py:75,135-139): ffill().bfill() "
    "per series — windowed last/first(ignorenulls), never leaking "
    "across series. 'error' rows are masked NULL to exercise the fill.",
)
def q_ffill_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    filled = ffill_bfill(ev, ["value"], ["user_id"], ["ts"])
    return filled.select(
        "event_id", "user_id", "ts", _r6(F.col("value")).alias("value_filled")
    )


@_register(
    "bounded_ffill",
    oracle="""
    WITH m AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type IN ('error', 'signup') THEN NULL ELSE value END AS value
      FROM events
    )
    SELECT event_id, user_id, ts,
           ROUND(COALESCE(value, last_value(value IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)), 6)
             AS value_filled
    FROM m
    """,
    tags=("window", "imputation"),
    doc="reference W14 (docs/preprocessing.md:38-41): bounded forward "
    "fill (limit=12) — fills at most the first 12 nulls of a gap, "
    "keeping window state O(limit).",
)
def q_bounded_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type").isin("error", "signup"), F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    filled = bounded_ffill(ev, ["value"], ["user_id"], ["ts"], limit=12)
    return filled.select(
        "event_id", "user_id", "ts", _r6(F.col("value")).alias("value_filled")
    )


@_register(
    "market_hours",
    oracle=f"""
    SELECT event_id, ts, user_id, value
    FROM events
    WHERE isodow(ts) BETWEEN 1 AND 5
      AND (hour(ts) * 60 + minute(ts)) >= 570
      AND (hour(ts) * 60 + minute(ts)) < 960
      AND CAST(ts AS DATE) NOT IN ({_HOLIDAY_LITERALS})
    """,
    tags=("filter", "calendar"),
    doc="reference P10 (preprocessing_pipeline.py:80-103): Mon-Fri "
    "09:30-16:00 minus US federal holidays. Codegen'd predicate + "
    "broadcast anti-join against the generated holiday dimension — no "
    "per-row Python like the reference.",
)
def q_market_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hol = us_federal_holidays(spark, _HOLIDAY_YEARS)
    out = market_hours_filter(ev, holidays=hol, ts_col="ts")
    return out.select("event_id", "ts", "user_id", "value")


@_register(
    "missing_slots",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events
      WHERE isodow(ts) BETWEEN 1 AND 5
        AND CAST(ts AS DATE) NOT IN ({_HOLIDAY_LITERALS})
    ), grid AS (
      SELECT user_id, d,
             CAST(d AS TIMESTAMP) + to_minutes(570 + i * 5) AS slot_ts
      FROM days, range(78) t(i)
    ), observed AS (
      SELECT DISTINCT user_id,
             to_timestamp((epoch_us(ts) // 300000000) * 300) AS slot_ts
      FROM events
    )
    SELECT g.user_id, g.d AS date,
           COUNT(*) AS n_missing,
           string_agg(strftime(g.slot_ts, '%H:%M:%S'), ',' ORDER BY g.slot_ts) AS missing_times
    FROM grid g
    ANTI JOIN observed o ON g.user_id = o.user_id AND g.slot_ts = o.slot_ts
    GROUP BY g.user_id, g.d
    ORDER BY g.user_id, date
    """,
    tags=("join", "calendar"),
    doc="reference J2 (preprocessing_pipeline.py:213-255): expected "
    "5-min market grid minus observed slots → missing-data report. "
    "Grid is sequence+explode (distributed), observed slots are "
    "floor-bucketed, LEFT ANTI join, per-day collect.",
)
def q_missing_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Optimization r11: the grid/anti-join formulation exploded
    # days x 78 slots (~2M rows at sf0.1) through two distinct
    # shuffles and a left-anti shuffle before re-grouping. The same
    # report is ONE partial-aggregating groupBy over the raw events:
    # an event's observed slot index is arithmetic on unix_micros
    # (5-min epoch bucket 114..191 of its UTC day), the per-day
    # missing set is filter(sequence(0,77), not in observed), and the
    # day/holiday gates apply to the ~78x-smaller grouped result.
    # Days with a full grid drop out via size(mi) > 0 exactly as they
    # produced no anti-join survivors before. Slot-time strings are
    # built by minute arithmetic per element (no captured-expression
    # higher-order lambda), ascending by construction — identical to
    # the sorted date_format output.
    ev = _t(spark, sf_dir, "events")
    hol = us_federal_holidays(spark, _HOLIDAY_YEARS)
    slot = F.expr("(unix_micros(ts) div 300000000) % 288")
    grouped = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.when(
                slot.between(114, 191), (slot - 114).cast("int")
            ).alias("i"),
        )
        .groupBy("user_id", "d")
        .agg(F.collect_set("i").alias("obs"))
        .filter(F.dayofweek("d").isin(2, 3, 4, 5, 6))
        .join(
            F.broadcast(hol), on=F.col("d") == F.col("holiday_date"), how="left_anti"
        )
    )
    # array_except, not filter(..., x -> NOT array_contains(obs, x)):
    # the lambda form is an interpreted HOF doing O(78 x |obs|) work
    # per group (array_contains re-scans obs per grid slot); the
    # native set-difference builds one hash set per group and keeps
    # the ascending grid order — identical elements (optimization
    # r11: missing_slots noop 5.8 -> see OPTIMIZATION_r11.md). The
    # slot-time strings are one 78-element literal lookup instead of
    # per-element div/mod/lpad/concat arithmetic — identical strings.
    mi = F.expr("array_except(sequence(0, 77), obs)")
    slot_strs = [
        f"{(570 + 5 * x) // 60:02d}:{(570 + 5 * x) % 60:02d}:00"
        for x in range(78)
    ]
    times = F.expr(
        f"transform(mi, x -> element_at(array({', '.join(map(repr, slot_strs))}), x + 1))"
    )
    return (
        grouped.select("user_id", F.col("d").alias("date"), mi.alias("mi"))
        .filter(F.size("mi") > 0)
        .select(
            "user_id",
            "date",
            F.size("mi").cast("long").alias("n_missing"),
            F.concat_ws(",", times).alias("missing_times"),
        )
        .orderBy("user_id", "date")
    )
