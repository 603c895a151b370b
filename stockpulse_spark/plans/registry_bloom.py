"""Bloom-pre-filtered semi-join as a registered, oracle-checked query.

The 100 TB motivation: `events` is the fact stream; "customers with a
high balance" is a build side that at production scale is far beyond
the broadcast threshold, so a naive semi-join shuffles every event row.
The bloom bitset (32 KB at the default m=2^18, independent of build
cardinality) broadcasts
instead and drops non-matching events before the shuffle. Semantics
stay exact (no false negatives + exact residual semi-join), so the
DuckDB oracle is the plain semi-join aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.operators.bloom import bloom_semi_join
from stockpulse_spark.plans.registry import _r4, _register, _t


@_register(
    "bloom_prefilter_semi_join",
    oracle="""
    SELECT e.event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e
    WHERE e.user_id IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("join", "semi", "bloom"),
    doc="Per-type activity of high-balance customers, computed as a "
    "Bloom-pre-filtered exact semi-join (operators/bloom.py): k=5 "
    "xxhash64 positions into a 2^18-bit bitset built with one "
    "map-side-combinable bit_or aggregate, inlined into the probe "
    "filter as a dense array literal (the broadcast-variable "
    "pattern — a join-carried bitset would be copied into every "
    "probe row), probed with forall()+bit_get() in codegen, then the "
    "exact semi-join removes false positives. Equivalent to "
    "IN(subquery) for any input — the bloom only shrinks the "
    "probe-side shuffle, which is the whole point when the build side "
    "outgrows the broadcast threshold.",
)
def q_bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    matched = bloom_semi_join(
        e.select("user_id", "event_type", "value"),
        rich,
        probe_key="user_id",
        build_key="c_custkey",
    )
    return (
        matched.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r4(F.sum("value")).alias("total_value"),
        )
        .orderBy("event_type")
    )
