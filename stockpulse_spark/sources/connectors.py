"""Connector seam for streaming ingestion — one interface, swappable
message-bus bindings.

The reference ingests through a hand-rolled Pub/Sub subscriber thread
(bigquery_loader.py:211-307: callback, JSON decode, ack/nack). Here
every binding normalizes to the same wire contract — a streaming
DataFrame with ONE string column `value`, one JSON message per record
— and shares `decode_stream_messages` (typed rows + `__ok` dead-letter
flag). Swapping the local file replay for Kafka or Pub/Sub Lite is a
CONFIG change at `open_stream`, not a code change anywhere downstream:
dedup_stream / streaming_resample / dual sinks consume the decoded
rows identically.

Bindings:

- ``file``  — newline-delimited JSON replay (the sandbox stand-in; no
  broker exists here). `path` required; `maxFilesPerTrigger` optional.
- ``rate``  — Spark's built-in rate-micro-batch source synthesizing
  deterministic wire messages; exercises the full decode/dedup/
  resample path against a genuinely unbounded source in tests.
- ``kafka`` — config-only binding to the standard Kafka source
  (requires `org.apache.spark:spark-sql-kafka-0-10_2.13` on the
  cluster classpath via `spark-submit --packages`; not present in
  this sandbox). Options pass straight through
  (`kafka.bootstrap.servers`, `subscribe`, `startingOffsets`, ...).
- ``pubsublite`` — same pattern for the Pub/Sub Lite Spark connector
  (`com.google.cloud:pubsublite-spark-sql-streaming`), matching the
  reference's actual bus.

At 100 TB the binding choice doesn't change the plan shape: every
source lands on the same watermark/dedup/window operators, and
parallelism comes from source partitions (files / Kafka partitions /
Lite subscriptions) feeding the same shuffle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockpulse_spark.schemas import STREAM_MESSAGE
from stockpulse_spark.streaming.pipeline import decode_stream_messages

SOURCES: dict[str, Callable[[SparkSession, dict], DataFrame]] = {}


def _binding(name: str):
    def reg(fn):
        SOURCES[name] = fn
        return fn

    return reg


@_binding("file")
def _file_source(spark: SparkSession, options: dict) -> DataFrame:
    """Newline-delimited JSON files as wire messages (FIXTURES.md F3)."""
    reader = spark.readStream
    if options.get("maxFilesPerTrigger"):
        reader = reader.option("maxFilesPerTrigger", options["maxFilesPerTrigger"])
    return reader.text(options["path"])  # text source yields `value` string


@_binding("rate")
def _rate_source(spark: SparkSession, options: dict) -> DataFrame:
    """Deterministic synthetic ticks from rate-micro-batch: value n →
    one of 4 symbols with a bounded price walk — enough structure for
    the decode/dedup/resample path to be exercised end-to-end."""
    fmt = options.pop("format", "rate-micro-batch")
    reader = spark.readStream.format(fmt)
    for key, val in options.items():
        reader = reader.option(key, val)
    raw = reader.load()  # (timestamp, value)
    px = 100.0 + (F.col("value") % 41).cast("double")
    return raw.select(
        F.to_json(
            F.struct(
                F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
                F.concat(F.lit("SYM"), (F.col("value") % 4).cast("string")).alias(
                    "symbol"
                ),
                px.alias("open"),
                (px + 1.0).alias("high"),
                (px - 1.0).alias("low"),
                px.alias("close"),
                (F.col("value") % 1000 + 1).alias("volume"),
            )
        ).alias("value")
    )


def _packaged_source(fmt: str, package: str):
    def bind(spark: SparkSession, options: dict) -> DataFrame:
        reader = spark.readStream.format(fmt)
        for key, val in options.items():
            reader = reader.option(key, val)
        try:
            raw = reader.load()
        except Exception as e:  # DATA_SOURCE_NOT_FOUND in this sandbox
            raise RuntimeError(
                f"the '{fmt}' binding needs its connector on the cluster "
                f"classpath: spark-submit --packages {package} (config-only "
                "in this environment — no broker exists here)"
            ) from e
        return raw.selectExpr("CAST(value AS STRING) AS value")

    return bind


SOURCES["kafka"] = _packaged_source(
    "kafka", "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
)
SOURCES["pubsublite"] = _packaged_source(
    "pubsublite", "com.google.cloud:pubsublite-spark-sql-streaming:<version>"
)


def open_stream(
    spark: SparkSession,
    kind: str,
    schema: T.StructType = STREAM_MESSAGE,
    **options,
) -> DataFrame:
    """Open a typed message stream through the named binding.

    Returns decoded rows (schema fields + `__ok` dead-letter flag +
    raw `value`), identical for every binding — the single seam the
    rest of the streaming pipeline plugs into.
    """
    if kind not in SOURCES:
        raise ValueError(f"unknown stream source {kind!r}; have {sorted(SOURCES)}")
    wire = SOURCES[kind](spark, dict(options))
    return decode_stream_messages(wire, schema)
