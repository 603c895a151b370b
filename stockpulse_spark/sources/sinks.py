"""Storage-layer sinks: bronze/silver lakehouse layout.

Reference storage (SURVEY §1.1): GCS blob archive per symbol
(raw-data/{symbol}/{ts}.json, stocks_pipeline.py:44-54), table-per-
symbol BigQuery DDL (bigquery_loader.py:46-116), sorted inserts
(:142-152). Spark-first replacement:

- ONE dataset partitioned by symbol (+ date) — `partitionBy` turns the
  reference's table-routing into partition pruning; a filter on symbol
  touches only that directory's files.
- bronze = raw bars as-ingested; silver = cleaned + derived columns.
  Both are plain parquet here; the same writers take Delta/Iceberg
  formats on a real deployment for MERGE/exactly-once.
- catalog bootstrap ≙ the reference's ensure_dataset_and_tables:
  CREATE TABLE IF NOT EXISTS with an explicit schema.

Scale notes: partition by LOW-cardinality keys only (symbol: ~10³-10⁴
dirs fine; never by timestamp — that's what row-group min/max stats
handle). Sort WITHIN partitions by timestamp at write
(sortWithinPartitions) so row-group pruning works for time-range
scans — this replaces the reference's cosmetic sorted insert S13 with
one that actually prunes IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stockpulse_spark.schemas import BARS_PROCESSED, BARS_RAW


def write_bronze(df: DataFrame, path: str, partition_cols: list[str] = ("symbol",)) -> None:
    """Raw append-only archive (reference S5/S6 GCS blobs)."""
    (
        df.repartition(*partition_cols)
        .sortWithinPartitions("timestamp")
        .write.mode("append")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_silver(
    df: DataFrame, path: str, partition_cols: list[str] = ("symbol", "date")
) -> None:
    """Cleaned + derived table (reference processed tables)."""
    (
        df.repartition(*[c for c in partition_cols])
        .sortWithinPartitions("timestamp")
        .write.mode("append")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def ensure_tables(spark: SparkSession, db: str = "stockpulse") -> None:
    """Catalog bootstrap (reference S9, bigquery_loader.py:46-116):
    database + raw/processed tables with explicit schemas, idempotent."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    raw_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in BARS_RAW)
    proc_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in BARS_PROCESSED
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {db}.bars_raw ({raw_ddl}) USING parquet "
        "PARTITIONED BY (symbol)"
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {db}.bars_processed ({proc_ddl}) USING parquet "
        "PARTITIONED BY (symbol, date)"
    )
