"""Spark SQL API surface: the same engine is driveable with plain SQL
over registered views (spark.sql), not only the DataFrame API — shown
with a weekly-active-users rollup whose SQL text is shared almost
verbatim with the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stockpulse_spark.plans.registry import _register, _t

_WAU_SQL = """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
       COUNT(DISTINCT user_id) AS active_users,
       COUNT(*) AS n_events,
       ROUND(SUM(value) * 1000000.0) / 1000000.0 AS total_value
FROM {table}
GROUP BY CAST(date_trunc('week', ts) AS DATE)
ORDER BY week_start
"""


@_register(
    "sql_weekly_active_users",
    oracle=_WAU_SQL.replace("{table}", "events").replace(
        "ROUND(SUM(value) * 1000000.0) / 1000000.0", "ROUND(SUM(value), 6)"
    ),
    tags=("sql", "agg"),
    doc="the SQL API path: identical SQL text runs via spark.sql over "
    "a registered view and via DuckDB (only the round spelling "
    "differs, per the documented scale-multiply mimic) — users who "
    "prefer SQL to the DataFrame API get the same Catalyst plans.",
)
def q_sql_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("__events_sql_api")
    return spark.sql(_WAU_SQL.replace("{table}", "__events_sql_api"))
