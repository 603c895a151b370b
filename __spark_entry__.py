"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``stockpulse_spark``; this module re-exports
the registry (stockpulse_spark/plans/registry.py) and the flagship
pipeline.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stockpulse_spark.plans import (  # noqa: E402
    oracle_sql as _oracle_sql,
    queries as _queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on /root/testdata/sf0.001 — the reference's
    preprocessing + analytics path as one Spark plan: clean → dedup →
    per-(series,day) rolling/cumulative averages → hourly OHLCV bars
    with indicator columns."""
    from stockpulse_spark.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
