"""stockpulse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference stock-analytics pipeline (StockPulse):
time-series ingestion, cleaning/validation, window-function indicator
analytics, dedup, resampling, and streaming micro-batch semantics —
re-expressed as DataFrame / Spark SQL plans that Catalyst optimizes —
plus the large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal plumbing) such an engine
needs at 100 TB.

Layout:
    session     SparkSession builders tuned for local[*] and cluster use
    schemas     canonical StructTypes (OHLCV bars, stream messages, ...)
    sources/    batch table loaders + raw-API JSON parsing + replay
    operators/  dedup, quality/validation, calendar, resample
    functions/  indicator expression library (window Column builders)
    plans/      the named query registry (queries + DuckDB oracle SQL)
    streaming/  Structured Streaming parity (watermark dedup, dual sink)
    llmdata/    training-data ops: text stats, dedup, ANN, multimodal
"""

__version__ = "0.1.0"
