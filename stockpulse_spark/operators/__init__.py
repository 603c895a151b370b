from stockpulse_spark.operators.dedup import (
    dedup_keep_latest,
    duplicate_report,
    new_keys_only,
)
from stockpulse_spark.operators.quality import (
    bounded_ffill,
    clean_bars,
    ensure_columns,
    ffill_bfill,
    scrub_non_finite,
    validate_required_columns,
)
from stockpulse_spark.operators.resample import resample_ohlcv
from stockpulse_spark.operators.calendar import (
    market_hours_filter,
    missing_slots_report,
    us_federal_holidays,
)

__all__ = [
    "dedup_keep_latest",
    "duplicate_report",
    "new_keys_only",
    "bounded_ffill",
    "clean_bars",
    "ensure_columns",
    "ffill_bfill",
    "scrub_non_finite",
    "validate_required_columns",
    "resample_ohlcv",
    "market_hours_filter",
    "missing_slots_report",
    "us_federal_holidays",
]
