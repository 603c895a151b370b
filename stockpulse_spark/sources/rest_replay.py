"""Raw REST-payload parsing (reference S1/P1/P2).

The reference fetches Alpha-Vantage-shaped nested JSON —
{"Time Series (5min)": {ts: {"1. open": "str", …}}} — and pivots it
row-by-row in Python (stocks_pipeline.py:129-139,
data_preprocessor.py:43-51). Here the payload lands as a string
column and ONE declarative expression does parse → explode → prefix-
strip → cast, all JVM-side:

    from_json(map<string, map<string,string>>)  nested dict
    explode(map_entries)                        ts → row pivot (P1)
    regexp strip of the "1. " value prefixes    (P2) — the reference
    strips with str.strip("1234. ") per column; values arrive under
    numbered KEYS ("1. open"), fetched via element_at.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# three levels: series-name → (timestamp → (numbered field → string value))
PAYLOAD_SCHEMA = T.MapType(
    T.StringType(),
    T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType())),
)

SERIES_KEY = "Time Series (5min)"


def parse_api_payload(
    df: DataFrame, payload_col: str = "payload", symbol_col: str = "symbol"
) -> DataFrame:
    """payload JSON string (+ symbol) → OHLCV bar rows.

    Output schema matches schemas.BARS_RAW. Malformed payloads yield
    zero rows (from_json → NULL map → explode drops), mirroring the
    reference's defensive `.get(series, {})`.
    """
    parsed = df.withColumn("__m", F.from_json(F.col(payload_col), PAYLOAD_SCHEMA))
    series = F.element_at(F.col("__m"), SERIES_KEY)
    bars = parsed.select(
        F.col(symbol_col).alias("symbol"),
        F.explode(series).alias("ts_str", "fields"),
    )

    def fld(key: str) -> Column:
        return F.element_at(F.col("fields"), key).cast("double")

    return bars.select(
        F.to_timestamp("ts_str").alias("timestamp"),
        "symbol",
        fld("1. open").alias("open"),
        fld("2. high").alias("high"),
        fld("3. low").alias("low"),
        fld("4. close").alias("close"),
        fld("5. volume").cast("long").alias("volume"),
    )


def incremental_gate(
    batch: DataFrame,
    last_seen: DataFrame,
    ts_col: str = "timestamp",
    key_col: str = "symbol",
    retention_days: int = 30,
) -> DataFrame:
    """Batch equivalent of the reference's fetch gate + retention filter
    (S3/S4, stocks_pipeline.py:89-155): keep rows newer than the stored
    per-key max timestamp AND within the retention window. `last_seen`
    is (key, max_ts) — tiny, broadcast."""
    ls = last_seen.select(
        F.col(key_col).alias("__k"), F.col("max_ts").alias("__last")
    )
    joined = batch.join(
        F.broadcast(ls), on=batch[key_col] == F.col("__k"), how="left"
    )
    keep = (F.col("__last").isNull() | (F.col(ts_col) > F.col("__last"))) & (
        F.col(ts_col)
        >= F.current_timestamp() - F.make_interval(days=F.lit(retention_days))
    )
    return joined.filter(keep).drop("__k", "__last")
