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


def write_bronze(
    df: DataFrame,
    path: str,
    partition_cols: list[str] = ("symbol",),
    fmt: str = "parquet",
) -> None:
    """Raw append-only archive (reference S5/S6 GCS blobs).

    fmt: parquet (default — columnar, prunable), json or csv for
    byte-compatible parity with the reference's blob archive
    (raw-data/{symbol}/*.json, stocks_pipeline.py:44-54).
    """
    (
        df.repartition(*partition_cols)
        .sortWithinPartitions("timestamp")
        .write.mode("append")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def bucket_fact_tables(
    spark: SparkSession,
    sf_dir: str,
    db: str = "stockpulse_bucketed",
    n_buckets: int = 8,
) -> None:
    """Write lineitem/orders as tables BUCKETED by the join key.

    The star join's one unavoidable exchange (lineitem⋈orders on
    orderkey — see revenue_by_nation) disappears when both sides are
    bucketed identically: each task reads matching buckets and joins
    locally. At 100 TB this converts the dominant shuffle (TBs over
    the network per query) into a property of the storage layout paid
    once at write time. Demonstrated shuffle-free in
    tests/test_bucketed_join.py.
    """
    import shutil
    from urllib.parse import urlparse

    from stockpulse_spark.sources.tables import load_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        # the file-based warehouse outlives the in-memory catalog:
        # drop both the table AND any leftover location from a prior
        # session, or saveAsTable fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
        shutil.rmtree(f"{warehouse}/{db}.db/{name}", ignore_errors=True)
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(f"{db}.{name}")
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
