from stockpulse_spark.plans.registry import REGISTRY, QuerySpec, queries, oracle_sql

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
