"""Literal (metadata-sized) DataFrames as JVM LocalRelations.

`spark.createDataFrame(python_rows, ...)` parallelizes the rows into a
pickled RDD over defaultParallelism partitions; EVERY action on a plan
containing that frame then runs one Python-worker round trip per
partition just to deserialize a handful of literal rows — measured
~5 s per collect for a 36-row grid on local[32] (optimization r11),
billed to every timed run of every query that embeds such a frame
(LSH tuning grids, SRP hyperplanes, the holiday dimension).

`values_df` renders the same rows as a single-parse `VALUES` SQL
literal instead: a LocalRelation evaluated inside the JVM — no RDD, no
Python workers, collect in ~30 ms. Values are rendered so the parsed
literals are BIT-IDENTICAL to the Python objects (float via repr —
shortest round-trip — cast to DOUBLE so Spark does not type it as
DECIMAL; dates as DATE literals; strings quote-escaped).
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["values_df"]


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        if abs(v) >= 2**63:
            # fail loudly like createDataFrame would: a bare out-of-
            # range literal would otherwise overflow to NULL (or raise
            # at ANSI runtime) deep inside the parsed VALUES relation
            raise TypeError(
                f"values_df: int literal {v} exceeds BIGINT range"
            )
        return f"CAST({v} AS BIGINT)" if abs(v) > 2**31 - 1 else str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            sign = "-" if v < 0 else ""
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        # repr is the shortest string that round-trips to the same
        # double; cast FROM STRING (Double.parseDouble), not from a
        # bare numeric literal — the parser types `-0.0` as DECIMAL,
        # which has no signed zero, so the bare form flips -0.0 to
        # +0.0 (caught by tests/test_opt_r11.py's bit-exactness test)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_cell(x) for x in v) + ")"
    raise TypeError(f"values_df: unsupported literal type {type(v)!r}")


def values_df(spark: SparkSession, rows, columns: list[str]) -> DataFrame:
    """LocalRelation from literal rows: one SQL parse, zero Python
    tasks. `rows` is a list of tuples; `columns` the output names."""
    if not rows:
        raise ValueError("values_df: rows must be non-empty")
    body = ", ".join("(" + ", ".join(_cell(c) for c in r) + ")" for r in rows)
    cols = ", ".join(columns)
    return spark.sql(f"SELECT * FROM VALUES {body} AS __v({cols})")
