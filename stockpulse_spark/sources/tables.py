"""Batch table loaders for the driver's parquet testdata.

The vectorized parquet reader + Catalyst give predicate pushdown and
column pruning for free — the reference hand-writes both into its SQL
strings (app/dashboard.py:33-46); here a plain `spark.read.parquet`
followed by declarative filter/select reaches the same scan shape
(check `.explain`: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.schemas import TESTDATA_TABLES


def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects natively. Footer-only check via pyarrow (no data read).
    Accepts either a single file or a Spark-written directory (all
    parts share one schema — read the first footer). Cached per
    (path, mtime) like every footer cache here (optimization r12)."""
    return _nanos_ts_columns_cached(path, _path_mtime_ns(path))


@lru_cache(maxsize=256)
def _nanos_ts_columns_cached(
    path: str, mtime_ns: int | None
) -> tuple[str, ...]:
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return ()
        path = parts[0]
    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-TZ TIMESTAMP.

    The testdata parquet stores tz-less microsecond timestamps; with
    `spark.sql.parquet.inferTimestampNTZ.enabled=true` (a default the
    driver's session may carry) Spark reads them as TIMESTAMP_NTZ,
    which `unix_micros`, `withWatermark`, and window() reject or treat
    differently. Under a UTC-pinned session the cast is value-identical,
    so normalizing at the load boundary keeps every downstream operator
    (and the DuckDB oracle comparison) agnostic to the reader config.
    """
    ntz = [name for name, dt in df.dtypes if dt == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Table HANDLE reuse (optimization r11): re-issuing spark.read.parquet
# for the same path re-lists the directory, re-reads the footer schema
# and re-runs the NTZ/nanos normalization chain — ~0.1-0.2 s of pure
# driver/metadata work per builder call, paid by every one of the
# bench's timed runs and by every parity invocation. The cached value
# is an unexecuted DataFrame (a logical plan + file index), NOT data:
# every action on it still scans the parquet input, so no query result
# or intermediate is ever reused across runs. Keyed by the session's
# JVM identity (a new session must not see another session's plans)
# and the file/dir mtime (a rewritten corpus — skew copies, fuzz dirs,
# maintenance rewrites — invalidates the stale file listing).
_HANDLE_CACHE: dict[tuple, DataFrame] = {}
_HANDLE_CACHE_MAX = 256


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table.

    Nanosecond timestamps (e.g. events.ts) are read as long via
    `spark.sql.legacy.parquet.nanosAsLong` and floor-divided to
    microseconds — the same truncation DuckDB applies, so oracle
    comparisons agree to the microsecond.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Pin the session TZ at the data boundary: the driver harness may
    # build its own SparkSession without our defaults, and every
    # date-derivation (to_date/hour/date_trunc) must agree with the
    # DuckDB oracle's naive-timestamp semantics regardless of host TZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Tz-less parquet timestamps must land as TIMESTAMP (not NTZ) —
    # see normalize_ntz. Belt (reader conf) and suspenders (post-cast).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    key = (id(spark._jsparkSession), os.path.abspath(path), mtime)
    hit = _HANDLE_CACHE.get(key)
    if hit is not None:
        return hit
    nanos = _nanos_ts_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    df = normalize_ntz(df)
    if len(_HANDLE_CACHE) >= _HANDLE_CACHE_MAX:
        _HANDLE_CACHE.pop(next(iter(_HANDLE_CACHE)))
    _HANDLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table and register it as a temp view so the
    same query can be written with the DataFrame API or spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def _path_mtime_ns(path: str) -> int | None:
    """mtime key for the footer-stat caches — same invalidation policy
    as _HANDLE_CACHE: an in-place rewrite of a table at the SAME path
    within one process must not serve stale footer statistics to the
    width/bound planners (optimization r12, r11 verdict item 7)."""
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return None


def footer_column_span(sf_dir: str, name: str, col: str):
    """(min, max) of `col` from parquet FOOTER statistics — zero data
    read, no Spark job. At cluster scale this is one metadata fetch per
    file (what any lakehouse table format keeps in its manifest), which
    is how a planner should derive static bounds — e.g. the hour-span
    cap on per-series bar counts that lets MACD assert its series bound
    without a probe aggregation. Returns None when any row group lacks
    stats (caller falls back to a probe). Cached per (path, mtime)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return _footer_column_span_cached(
        sf_dir, name, col, _path_mtime_ns(path)
    )


@lru_cache(maxsize=64)
def _footer_column_span_cached(
    sf_dir: str, name: str, col: str, mtime_ns: int | None
):
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    mn = mx = None
    for f in files:
        md = pq.read_metadata(f)
        sch = md.schema.to_arrow_schema()
        try:
            idx = sch.names.index(col)
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
    if mn is None:
        return None
    return mn, mx


def hour_span_bound(sf_dir: str, name: str = "events", col: str = "ts") -> int | None:
    """Upper bound on per-series HOURLY bar counts: the number of hour
    buckets between the dataset's min and max timestamp (footer stats
    only). A series keyed by (user, hour) can never exceed this,
    whatever the key distribution."""
    span = footer_column_span(sf_dir, name, col)
    if span is None:
        return None
    mn, mx = span
    if not hasattr(mn, "timestamp"):
        return None
    return int((mx.timestamp() - mn.timestamp()) // 3600) + 2


def footer_row_count(sf_dir: str, name: str) -> int | None:
    """Total row count from parquet FOOTER metadata — zero data read,
    no Spark job. The planner-side cardinality input for static
    decisions (e.g. sizing LSH bucket granularity to the corpus).
    Cached per (path, mtime) — see _path_mtime_ns."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return _footer_row_count_cached(sf_dir, name, _path_mtime_ns(path))


@lru_cache(maxsize=64)
def _footer_row_count_cached(
    sf_dir: str, name: str, mtime_ns: int | None
) -> int | None:
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    if not files:
        return None
    return sum(pq.read_metadata(f).num_rows for f in files)


def read_events_stream(spark: SparkSession, sf_dir: str):
    """File-source stream over the events table, layout-agnostic.

    Round 10: the driver testdata stores events as ONE parquet file
    (`sf_dir/events.parquet`), while replicated scale corpora are
    Spark-written DIRECTORIES of part files under the same name.  The
    file stream source requires a directory path, so the single-file
    layout streams `sf_dir` with a pathGlobFilter and the directory
    layout streams the directory itself (a glob filter there would
    match no files — part files sit one level down; this is the
    UNABLE_TO_INFER_SCHEMA the 10x parity tier caught on every
    streaming reader).  Timestamps are normalized exactly like
    load_table: nanos-as-long div 1000, NTZ cast to session-TZ.
    """
    load_table(spark, sf_dir, "events")  # pin TZ + reader confs
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(raw_schema).format("parquet")
    if os.path.isdir(path):
        stream = reader.load(path)
    else:
        stream = reader.option("pathGlobFilter", "events.parquet").load(
            sf_dir
        )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream
