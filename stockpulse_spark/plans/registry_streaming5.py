"""Watermarked stream-stream LEFT OUTER join — the one streaming join
state machine the suite did not yet exercise.

The inner stream-stream join (registry_attrib) emits matched pairs as
they arrive; the OUTER variant additionally emits a null-padded row
for every unmatched left row — but only once the right-side watermark
has passed the point where a match could still arrive (state
eviction). That deferred-emission semantics is a genuinely different
state machine from the inner join and cannot be observed in a
single-micro-batch replay: the watermark only advances BETWEEN
micro-batches, so a one-file availableNow run would never emit any
null-padded row. The replay harness therefore writes the event
stream as K time-ordered chunk files and rate-limits the file source
to one file per micro-batch (`maxFilesPerTrigger=1`), giving the
watermark K chances to ratchet and evict.

Anchoring (tests/test_streaming5.py): the matched subset of the
emitted rows must equal the oracle-checked `purchase_attribution_batch`
row-for-row, and the null-padded subset must equal the oracle-checked
`unattributed_purchases` twin restricted to purchases older than the
final watermark read from the query's last progress — i.e. both halves
of the outer join are anchored to DuckDB oracles, with the watermark
frontier (the only part batch SQL cannot express) taken from the
engine's own progress metrics rather than re-derived.

Reference parity: the reference's pipeline is single-stream (T1-T7,
`/root/reference/processing/stream_consumer.py`); outer stream-stream
joins are beyond it — this extends SURVEY §2.8 the same way the inner
join did.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stockpulse_spark.plans.registry import _r6, _register, _t
from stockpulse_spark.plans.registry_attrib import _WINDOW_H, _attrib_pairs

_N_CHUNKS = 8


@_register(
    "unattributed_purchases",
    oracle=f"""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           ROUND(p.value, 6) AS purchase_value
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = p.user_id
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL {_WINDOW_H} HOUR)
    ORDER BY purchase_id
    """,
    tags=("streaming", "join"),
    doc=f"purchases with NO qualifying click in the {_WINDOW_H}h "
    "attribution window — the null-padded half of the outer "
    "stream-stream join as a batch anti-join. The NOT EXISTS runs as "
    "a LEFT ANTI join whose equi-key (user_id) carries the one "
    "shuffle; the interval predicate evaluates inside the join, "
    "never as a post-filter over a cartesian. Same 100 TB posture "
    "as purchase_attribution_batch.",
)
def q_unattributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    anti = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {_WINDOW_H} HOURS")
        ),
        "left_anti",
    )
    return anti.select(
        "user_id",
        "purchase_id",
        _r6(F.col("value")).alias("purchase_value"),
    ).orderBy("purchase_id")


def _write_replay_chunks(
    spark: SparkSession,
    sf_dir: str,
    types: tuple[str, ...] = ("click", "purchase"),
) -> str:
    """Replay harness (not the operator): write the selected event
    types as _N_CHUNKS time-ordered parquet files so the file source
    can be rate-limited to one file per micro-batch — the knob that
    lets the watermark ratchet and deferred-emission semantics
    (outer-join eviction, event-time timeouts) actually fire. The
    global-sort ntile is driver-test plumbing only — production
    streams arrive pre-ordered from the bus. mtimes are pinned
    strictly increasing so the file source's oldest-first ordering
    matches chunk order on any filesystem timestamp granularity."""
    watch = tempfile.mkdtemp(prefix="sp_outer_replay_")
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*types)
    )
    chunked = ev.withColumn(
        "__c",
        F.ntile(_N_CHUNKS).over(Window.orderBy("ts", "event_id")),
    )
    stage = tempfile.mkdtemp(prefix="sp_outer_stage_")
    # ONE partitioned write instead of _N_CHUNKS filtered writes: the
    # old per-chunk loop re-executed the global-sort ntile window over
    # the whole event set once PER chunk (8 full passes). partitionBy
    # runs it once; the single window task emits exactly one part file
    # per __c value, and partitionBy drops __c from the data files just
    # like the old .drop("__c") did (optimization r11, guide §1.2).
    chunked.write.partitionBy("__c").mode("overwrite").parquet(stage)
    # degenerate corpora (empty events, or fewer rows than chunks)
    # produce NO partition directory for the unpopulated __c values —
    # the old per-chunk coalesce(1) writer emitted a schema-complete
    # empty file for those, and the replay contract (one file per
    # micro-batch) needs all _N_CHUNKS files, so synthesize one empty
    # chunk file and copy it into the gaps (round-7 empty-corpus gate)
    empty_src: str | None = None
    base = 1_700_000_000
    for i in range(1, _N_CHUNKS + 1):
        srcs = glob.glob(os.path.join(stage, f"__c={i}", "part-*.parquet"))
        if len(srcs) > 1:  # single global-window task → one file/chunk
            raise RuntimeError(
                f"replay chunk {i}: expected 1 part file, got {len(srcs)}"
            )
        dst = os.path.join(watch, f"chunk_{i:03d}.parquet")
        if srcs:
            shutil.move(srcs[0], dst)
        else:
            if empty_src is None:
                edir = os.path.join(stage, "__empty")
                ev.limit(0).coalesce(1).write.mode("overwrite").parquet(edir)
                (empty_src,) = glob.glob(
                    os.path.join(edir, "part-*.parquet")
                )
            shutil.copyfile(empty_src, dst)
        os.utime(dst, (base + i, base + i))
    shutil.rmtree(stage, ignore_errors=True)
    return watch


@_register(
    "stream_attribution_outer",
    oracle=None,  # outer stream-stream join semantics — rows-only
    # check; both halves oracle-anchored transitively
    # (tests/test_streaming5.py): matched == purchase_attribution_batch,
    # null-padded == unattributed_purchases below the final watermark
    tags=("streaming", "join"),
    doc="watermarked stream-stream LEFT OUTER join: clicks and "
    f"purchases replay as {_N_CHUNKS} time-ordered chunk files, one "
    "per micro-batch (maxFilesPerTrigger=1), joined on user within "
    f"{_WINDOW_H}h before the purchase under 2h watermarks on BOTH "
    "sides. Matched pairs emit immediately; an unmatched purchase "
    "emits with NULL click columns only when the click-side "
    "watermark passes its timestamp (state eviction) — purchases "
    "newer than the final watermark stay un-emitted BY DESIGN, which "
    "is exactly the correctness contract of outer streaming joins. "
    "State is bounded: the range condition lets Spark derive "
    "eviction thresholds for both sides, so at 100 TB state holds "
    "watermark-delay + window hours of hot keys, not history.",
)
def q_stream_attribution_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    watch = _write_replay_chunks(spark, sf_dir)
    schema = spark.read.parquet(
        os.path.join(watch, "chunk_001.parquet")
    ).schema

    def stream() -> DataFrame:
        s = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(watch)
        )
        if dict(s.dtypes).get("ts") == "timestamp_ntz":
            s = s.withColumn("ts", F.col("ts").cast("timestamp"))
        return s.withWatermark("ts", "2 hours")

    pairs = _attrib_pairs(
        stream().filter(F.col("event_type") == "click"),
        stream().filter(F.col("event_type") == "purchase"),
        how="leftOuter",
    )
    name = f"stream_outer_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sp_ckpt_"))
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_attribution_outer: availableNow run exceeded 300s"
        )
    # stash the final watermark where the anchoring test can read it
    # without re-running the query (progress is engine metadata, not
    # part of the result set)
    wm = None
    for prog in reversed(q.recentProgress):
        et = prog.get("eventTime") or {}
        if et.get("watermark"):
            wm = et["watermark"]
            break
    spark.conf.set("stockpulse.lastOuterWatermark", wm or "")
    return spark.table(name)
