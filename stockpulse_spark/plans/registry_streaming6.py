"""Event-time TIMEOUT stateful processing — the last stateful
primitive the suite did not exercise: state that acts when time
passes WITHOUT data (applyInPandasWithState +
GroupStateTimeout.EventTimeTimeout).

The watermarked joins/aggregations all key their output to arriving
rows; an abandoned-session detector is the canonical op that cannot:
"a view with NO purchase within 4h" must EMIT when the watermark
passes the deadline, triggered by a timeout callback on a group that
received no data. Per user the state holds the pending views; each
data batch resolves pending views covered by arriving purchases
(v < p <= v+4h) and re-arms the group timeout at the earliest
remaining deadline; the timeout callback (empty input, hasTimedOut)
emits every pending view whose deadline the watermark passed.

Anchoring (tests/test_streaming6.py): the batch twin
`abandoned_views_batch` (oracle-backed interval anti-join) is the
ground truth; the streamed rows must be bracketed by the twin
filtered at the engine-reported final watermark — strictly-past
deadlines MUST have emitted, nothing beyond the loose frontier may
exist, and every emitted row must be in the twin. (The bracket, not
equality, because whether a deadline EXACTLY at the final watermark
fires depends on the engine's boundary convention — the one bit the
oracle cannot express.)

Reference parity: the reference is single-stream aggregate-only
(T1-T7); timeout-driven emission extends SURVEY §2.8 beyond it, same
as the outer join (registry_streaming5).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_streaming5 import _write_replay_chunks

_ABANDON_H = 4
_T_US = _ABANDON_H * 3600 * 1_000_000

_ABANDON_OUT_SCHEMA = "user_id long, view_id long, view_ts_us long"
_ABANDON_STATE_SCHEMA = "ts array<long>, ids array<long>"


@_register(
    "abandoned_views_batch",
    oracle=f"""
    SELECT v.user_id,
           v.event_id AS view_id,
           epoch_us(v.ts) AS view_ts_us,
           ROUND(v.value, 6) AS view_value
    FROM events v
    WHERE v.event_type = 'view'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = v.user_id
          AND p.ts > v.ts
          AND p.ts <= v.ts + INTERVAL {_ABANDON_H} HOUR)
    ORDER BY view_id
    """,
    tags=("streaming", "join"),
    doc=f"views not followed by a purchase within {_ABANDON_H}h — the "
    "forward-looking interval anti-join (the mirror of "
    "unattributed_purchases) and the ground truth for the "
    "timeout-driven streaming detector. LEFT ANTI on the user_id "
    "equi-key with the range predicate inside the join.",
)
def q_abandoned_views_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        "value",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    anti = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("view_ts"))
        & (
            F.col("p_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {_ABANDON_H} HOURS")
        ),
        "left_anti",
    )
    return anti.select(
        "user_id",
        "view_id",
        F.unix_micros("view_ts").alias("view_ts_us"),
        _r6(F.col("value")).alias("view_value"),
    ).orderBy("view_id")


def _abandon_fn(key, pdf_iter, state):
    """applyInPandasWithState kernel: pending-view list state with an
    event-time timeout armed at the earliest outstanding deadline."""
    pend_ts, pend_ids = (
        ([list(x) for x in state.get] if state.exists else ([], []))
    )
    if state.hasTimedOut:
        wm_us = state.getCurrentWatermarkMs() * 1000
        fired_ts, fired_ids, keep_ts, keep_ids = [], [], [], []
        for t, i in zip(pend_ts, pend_ids):
            if t + _T_US <= wm_us:
                fired_ts.append(t)
                fired_ids.append(i)
            else:
                keep_ts.append(t)
                keep_ids.append(i)
        if keep_ts:
            state.update((keep_ts, keep_ids))
            # ms, nudged past the watermark if the next deadline
            # already expired at ms granularity
            state.setTimeoutTimestamp(
                max(
                    (min(keep_ts) + _T_US) // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        else:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(fired_ids),
                "view_id": fired_ids,
                "view_ts_us": fired_ts,
            }
        )
        return

    batch = pd.concat(list(pdf_iter)).sort_values(
        ["ts", "event_id"], kind="stable"
    )
    for _, row in batch.iterrows():
        t_us = int(pd.Timestamp(row["ts"]).value) // 1000
        if row["event_type"] == "view":
            pend_ts.append(t_us)
            pend_ids.append(int(row["event_id"]))
        else:  # purchase resolves the views it covers: v < p <= v+T
            keep_ts, keep_ids = [], []
            for t, i in zip(pend_ts, pend_ids):
                if not (t < t_us <= t + _T_US):
                    keep_ts.append(t)
                    keep_ids.append(i)
            pend_ts, pend_ids = keep_ts, keep_ids
    if pend_ts:
        state.update((pend_ts, pend_ids))
        state.setTimeoutTimestamp(
            max(
                (min(pend_ts) + _T_US) // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
    elif state.exists:
        state.remove()
    yield pd.DataFrame(
        {"user_id": [], "view_id": [], "view_ts_us": []}
    ).astype({"user_id": "int64", "view_id": "int64", "view_ts_us": "int64"})


@_register(
    "stream_abandoned_views",
    oracle=None,  # timeout-driven emission — rows-only check;
    # oracle-anchored via abandoned_views_batch under the
    # engine-reported watermark frontier (tests/test_streaming6.py)
    tags=("streaming", "stateful"),
    doc="timeout-driven abandoned-view detector: views and purchases "
    f"replay as time-ordered chunks (one file per micro-batch); per "
    "user, list state holds pending views, arriving purchases "
    f"resolve those they cover (v < p <= v+{_ABANDON_H}h), and a "
    "GroupStateTimeout.EventTimeTimeout armed at the earliest "
    "outstanding deadline emits the abandoned ones when the "
    "watermark passes — emission WITHOUT an arriving row, the "
    "semantics no join or windowed agg can express. State is bounded "
    f"by watermark + {_ABANDON_H}h per key at any scale.",
)
def q_stream_abandoned_views(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    watch = _write_replay_chunks(
        spark, sf_dir, types=("view", "purchase")
    )
    schema = spark.read.parquet(
        os.path.join(watch, "chunk_001.parquet")
    ).schema
    s = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(watch)
    )
    if dict(s.dtypes).get("ts") == "timestamp_ntz":
        s = s.withColumn("ts", F.col("ts").cast("timestamp"))
    s = s.withWatermark("ts", "2 hours")

    out = s.groupBy("user_id").applyInPandasWithState(
        _abandon_fn,
        outputStructType=_ABANDON_OUT_SCHEMA,
        stateStructType=_ABANDON_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = f"stream_abandon_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_abandoned_views: availableNow run exceeded 300s"
        )
    wm = None
    for prog in reversed(q.recentProgress):
        et = prog.get("eventTime") or {}
        if et.get("watermark"):
            wm = et["watermark"]
            break
    spark.conf.set("stockpulse.lastAbandonWatermark", wm or "")
    return spark.table(name)
