"""Data-quality / validation operators (reference P6-P11).

All pure-DataFrame, no UDFs: every expression stays inside whole-stage
codegen. Filters are declared (not applied imperatively) so Catalyst
pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class SchemaValidationError(ValueError):
    pass


def validate_required_columns(df: DataFrame, required: list[str]) -> DataFrame:
    """Raise if any required column is missing (reference P8:
    src/preprocessing/preprocessing_pipeline.py:28-36,112-115)."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise SchemaValidationError(f"missing required columns: {missing}")
    return df


def ensure_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Project to exactly `columns`, adding missing ones as NULL —
    pandas `reindex(columns=...)` (reference P11:
    preprocessing_pipeline.py:38-45,203-204)."""
    return df.select(
        *[
            F.col(c) if c in df.columns else F.lit(None).alias(c)
            for c in columns
        ]
    )


def clean_bars(
    df: DataFrame,
    critical: list[str] = ("timestamp", "symbol", "open", "high", "low", "close", "volume"),
    positive: list[str] = ("open", "high", "low", "close", "volume"),
    high_col: str = "high",
    low_col: str = "low",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level quality gate (reference P9:
    preprocessing_pipeline.py:124-135): drop exact duplicates, drop
    nulls in critical columns, require all-positive prices/volume and
    high >= low. One scan; the conjunctive predicate is pushed down.
    """
    out = df.dropDuplicates(list(key_cols) if key_cols else None)
    out = out.na.drop(subset=[c for c in critical if c in df.columns])
    pred = F.lit(True)
    for c in positive:
        if c in df.columns:
            pred = pred & (F.col(c) > 0)
    if high_col in df.columns and low_col in df.columns:
        pred = pred & (F.col(high_col) >= F.col(low_col))
    return out.filter(pred)


def scrub_non_finite(df: DataFrame, cols: list[str]) -> DataFrame:
    """±inf / NaN → NULL, −0.0 → +0.0 (reference P7:
    app/dashboard.py:137-139, extended with zero-sign
    canonicalization).

    The signed-zero scrub is the ingestion-layer answer to the
    round-6 fuzz findings: −0.0 survives parquet round-trips, fails
    Spark's pushed-down `value = 0.0` parquet filter (binary stats
    comparison), and renders differently from +0.0 through every
    downstream hash — scrubbing at bronze means no analytics query
    ever sees a signed zero. `x + 0.0` is the IEEE identity on every
    other double (NULL and NaN included, and NaN is already NULLed
    above).
    """
    out = df
    for c in cols:
        col = F.col(c)
        out = out.withColumn(
            c,
            F.when(
                F.isnan(col) | (F.abs(col) == float("inf")), F.lit(None)
            ).otherwise(col + 0.0),
        )
    return out


def ffill_bfill(
    df: DataFrame,
    cols: list[str],
    partition_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Forward-fill then back-fill within a partition (reference P6:
    app/dashboard.py:75,90,135-139 — pandas `ffill().bfill()`).

    Windowed `last(ignorenulls)` forward + `first(ignorenulls)`
    backward. Partitioned by symbol so fills never leak across
    series (SURVEY §4 pitfall ledger).
    """
    fwd = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        filled = F.coalesce(
            F.last(F.col(c), ignorenulls=True).over(fwd),
            F.first(F.col(c), ignorenulls=True).over(bwd),
        )
        out = out.withColumn(c, filled)
    return out


def bounded_ffill(
    df: DataFrame,
    cols: list[str],
    partition_cols: list[str],
    order_cols: list[str],
    limit: int = 12,
) -> DataFrame:
    """Forward-fill at most `limit` rows (reference W14:
    docs/preprocessing.md:38-41 — `fillna(method='ffill', limit=12)` so
    fills don't cross trading days). Bounded frame keeps state O(limit).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-limit, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.last(F.col(c), ignorenulls=True).over(w)))
    return out
