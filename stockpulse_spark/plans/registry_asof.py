"""As-of and range joins — the tick-data join extensions (SURVEY §2.5
notes the reference implements neither; they're the natural next
operators for a market-data engine, and DuckDB's native ASOF JOIN
provides an exact oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.functions.nullsafe import nan_nn, max_by_nn, min_by_nn

from stockpulse_spark.operators.asof import asof_join
from stockpulse_spark.sources.tables import read_events_stream
from stockpulse_spark.plans.registry import _r6, _register, _t


@_register(
    "asof_prev_close",
    oracle="""
    WITH eod AS (
      SELECT user_id, CAST(ts AS DATE) AS d, last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS prev_close,
             CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY AS avail_ts
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           ROUND(d.prev_close, 6) AS prev_close
    FROM events e
    ASOF LEFT JOIN eod d ON e.user_id = d.user_id AND e.ts >= d.avail_ts
    """,
    headline=True,
    tags=("join", "asof"),
    doc="point-in-time join: every event gets the most recent PRIOR "
    "day's closing value for its series (EOD closes become available "
    "at next midnight). Spark side: union-and-fill as-of join "
    "(operators/asof.py) — one shuffle of |L|+|R|, no range cross "
    "product; oracle: DuckDB's native ASOF JOIN.",
)
def q_asof_prev_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    eod = (
        # NaN mask hoisted to one projection (see _hourly_bars note)
        ev.withColumn("__v", nan_nn("value"))
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(max_by_nn("__v", "ts").alias("prev_close"))
        .select(
            "user_id",
            "prev_close",
            (F.to_timestamp("d") + F.expr("INTERVAL 1 DAY")).alias("avail_ts"),
        )
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts", "value"),
        eod,
        on=["user_id"],
        left_ts="ts",
        right_ts="avail_ts",
        payload_cols=["prev_close"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "value", _r6(F.col("prev_close")).alias("prev_close")
    )


@_register(
    "asof_tolerance_hour_close",
    oracle="""
    WITH hb AS (
      SELECT user_id,
             date_trunc('hour', ts) + INTERVAL 1 HOUR AS avail_ts,
             last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS hour_close
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           ROUND(CASE WHEN epoch_us(e.ts) - epoch_us(h.avail_ts) <= 7200000000
                      THEN h.hour_close END, 6) AS prev_hour_close
    FROM events e
    ASOF LEFT JOIN hb h ON e.user_id = h.user_id AND e.ts >= h.avail_ts
    """,
    tags=("join", "asof"),
    doc="as-of join WITH TOLERANCE (pandas merge_asof tolerance "
    "semantics): every event gets the previous completed hour's close "
    "for its series, but only if that hourly bar closed within 2 "
    "hours — stale marks across session gaps (nights, weekends) "
    "surface as NULL instead of silently carrying days-old state. "
    "Spark side: union-and-fill with the matched bar timestamp "
    "riding in the fill struct; the distance check is exact integer "
    "microseconds (unix_micros ↔ epoch_us) on both engines.",
)
def q_asof_tolerance_hour_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hb = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(max_by_nn(nan_nn("value"), "ts").alias("hour_close"))
        .select(
            "user_id",
            "hour_close",
            (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("avail_ts"),
        )
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts", "value"),
        hb,
        on=["user_id"],
        left_ts="ts",
        right_ts="avail_ts",
        payload_cols=["hour_close"],
        tolerance=7200.0,
    )
    return joined.select(
        "event_id", "user_id", "ts", "value",
        _r6(F.col("hour_close")).alias("prev_hour_close"),
    )


@_register(
    "asof_forward_next_open",
    oracle="""
    WITH db AS (
      SELECT user_id,
             CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_start,
             first(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS day_open
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           d.day_start AS open_day_start,
           ROUND(d.day_open, 6) AS next_open
    FROM events e
    ASOF LEFT JOIN db d ON e.user_id = d.user_id AND e.ts <= d.day_start
    """,
    tags=("join", "asof"),
    doc="FORWARD as-of join (pandas merge_asof direction='forward', "
    "DuckDB ASOF with the inequality flipped): every event gets the "
    "next session's opening value — the earliest daily open stamped "
    "at or after the event (an event exactly at midnight matches its "
    "own day, matching DuckDB's inclusive <=). The look-ahead "
    "attribution join of event-study pipelines. Spark side: same "
    "single union-and-fill sort as backward, `first` over the "
    "following frame instead of `last` over the preceding one.",
)
def q_asof_forward_next_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    db = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(min_by_nn(nan_nn("value"), "ts").alias("day_open"))
        .select("user_id", "day_open", F.to_timestamp("d").alias("day_start"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts", "value"),
        db,
        on=["user_id"],
        left_ts="ts",
        right_ts="day_start",
        payload_cols=["day_start", "day_open"],
        direction="forward",
    )
    return joined.select(
        "event_id", "user_id", "ts", "value",
        F.col("day_start").alias("open_day_start"),
        _r6(F.col("day_open")).alias("next_open"),
    )


@_register(
    "asof_nearest_week_anchor",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
             last(value ORDER BY ts, value) FILTER (WHERE value IS NOT NULL AND isfinite(value)) AS day_close
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    wk AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
             ROUND(avg(value), 6) AS week_avg
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id, date_trunc('week', ts)
    ),
    b AS (
      SELECT d.user_id, d.day_ts, d.day_close, w.week_start AS b_ts, w.week_avg AS b_avg
      FROM daily d ASOF LEFT JOIN wk w
        ON d.user_id = w.user_id AND d.day_ts >= w.week_start
    ),
    f AS (
      SELECT d.user_id, d.day_ts, w.week_start AS f_ts, w.week_avg AS f_avg
      FROM daily d ASOF LEFT JOIN wk w
        ON d.user_id = w.user_id AND d.day_ts <= w.week_start
    )
    SELECT b.user_id, b.day_ts, ROUND(b.day_close, 6) AS day_close,
           CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
                     abs(epoch_us(b.day_ts) - epoch_us(b.b_ts)) <=
                     abs(epoch_us(b.day_ts) - epoch_us(f.f_ts)))
                THEN b.b_ts ELSE f.f_ts END AS anchor_week,
           ROUND(CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
                     abs(epoch_us(b.day_ts) - epoch_us(b.b_ts)) <=
                     abs(epoch_us(b.day_ts) - epoch_us(f.f_ts)))
                THEN b.b_avg ELSE f.f_avg END, 6) AS anchor_week_avg
    FROM b JOIN f ON b.user_id = f.user_id AND b.day_ts = f.day_ts
    """,
    tags=("join", "asof"),
    doc="NEAREST as-of join (pandas merge_asof direction='nearest'): "
    "each per-series daily bar is matched to its closest weekly "
    "anchor — backward or forward, whichever is nearer in absolute "
    "time, backward winning exact ties. Spark side evaluates BOTH "
    "fill directions over ONE window sort (last-over-preceding and "
    "first-over-following share the exchange) and picks by exact "
    "integer-microsecond distance; the oracle composes two native "
    "ASOF joins and re-joins on the (user_id, day) grouped key — "
    "unique by construction, so the recombination cannot fan out "
    "even on a fuzzed corpus with duplicate source rows.",
)
def q_asof_nearest_week_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clean = ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    daily = (
        clean.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(max_by_nn(nan_nn("value"), "ts").alias("day_close"))
        .select("user_id", F.to_timestamp("d").alias("day_ts"), "day_close")
    )
    wk = (
        clean.groupBy("user_id", F.date_trunc("week", F.col("ts")).alias("week_start"))
        .agg(_r6(F.avg("value")).alias("week_avg"))
    )
    joined = asof_join(
        daily,
        wk,
        on=["user_id"],
        left_ts="day_ts",
        right_ts="week_start",
        payload_cols=["week_start", "week_avg"],
        direction="nearest",
    )
    return joined.select(
        "user_id",
        "day_ts",
        _r6(F.col("day_close")).alias("day_close"),
        F.col("week_start").alias("anchor_week"),
        _r6(F.col("week_avg")).alias("anchor_week_avg"),
    )


@_register(
    "range_join_hour_stats",
    oracle="""
    WITH stats AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             max(value) AS hour_high, min(value) AS hour_low, count(*) AS hour_n
      FROM events GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT e.event_id, e.user_id, e.ts, e.value,
           ROUND(s.hour_high, 6) AS hour_high,
           ROUND(s.hour_low, 6)  AS hour_low,
           s.hour_n
    FROM events e
    JOIN stats s ON e.user_id = s.user_id AND date_trunc('hour', e.ts) = s.h
    """,
    tags=("join", "range"),
    doc="interval/range join done the scale-smart way: 'event within "
    "[bucket_start, bucket_end)' is rewritten as an EQUI-join on the "
    "truncated bucket key — a hash shuffle on dense keys instead of a "
    "non-equi range join's per-key cross product. The general recipe "
    "for fixed-width ranges; variable ranges bucket to a grid first.",
)
def q_range_join_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.max("value").alias("hour_high"),
        F.min("value").alias("hour_low"),
        F.count(F.lit(1)).alias("hour_n"),
    )
    joined = ev.withColumn("h", F.date_trunc("hour", F.col("ts"))).join(
        stats, on=["user_id", "h"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        _r6(F.col("hour_high")).alias("hour_high"),
        _r6(F.col("hour_low")).alias("hour_low"),
        "hour_n",
    )


def _eod_dim(ev: DataFrame) -> DataFrame:
    """The as-of dimension both asof_prev_close and its streaming twin
    share: per-series daily closes, available from next midnight."""
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(max_by_nn(nan_nn("value"), "ts").alias("prev_close"))
        .select(
            "user_id",
            "prev_close",
            (F.to_timestamp("d") + F.expr("INTERVAL 1 DAY")).alias("avail_ts"),
        )
    )


@_register(
    "stream_asof_enrich",
    oracle=None,  # stream-static temporal enrichment — rows-only
    # check; oracle-anchored transitively via asof_prev_close (driver-
    # green r01): row-for-row equality asserted in
    # tests/test_asof_generic.py, and it holds for ANY micro-batch
    # split because the dimension is static and each left row's fill
    # is independent of its batch-mates.
    tags=("streaming", "asof", "join"),
    doc="streaming as-of enrichment: events replay as a file stream "
    "and each micro-batch is point-in-time joined (foreachBatch -> "
    "union-and-fill asof_join) against the static EOD-close dimension "
    "— the canonical stream-static temporal join Structured Streaming "
    "has no native operator for. Unlike watermark-dependent ops the "
    "output is bit-identical to the batch twin under ANY batch "
    "boundaries (static right side, per-row independent fill), so "
    "the streaming form inherits asof_prev_close's driver-green "
    "oracle. At scale the per-batch cost is |batch|+|dim| rows "
    "through one hash shuffle; a broadcast of the dim's per-key tail "
    "(latest row per key at stream start) shrinks it further.",
)
def q_stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    ev_static = _t(spark, sf_dir, "events")  # pins TZ/nanos confs
    eod = _eod_dim(ev_static)
    s = read_events_stream(spark, sf_dir)

    out_dir = tempfile.mkdtemp(prefix="sp_asof_stream_")

    def enrich(batch_df: DataFrame, _batch_id: int) -> None:
        res = asof_join(
            batch_df.select("event_id", "user_id", "ts", "value"),
            eod,
            on=["user_id"],
            left_ts="ts",
            right_ts="avail_ts",
            payload_cols=["prev_close"],
        ).select(
            "event_id", "user_id", "ts", "value",
            _r6(F.col("prev_close")).alias("prev_close"),
        )
        res.write.mode("append").parquet(out_dir)

    q = (
        s.writeStream.foreachBatch(enrich)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix=f"sp_ckpt_{uuid.uuid4().hex[:8]}_"),
        )
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream_asof_enrich: availableNow run exceeded 300s")
    return spark.read.parquet(out_dir)
