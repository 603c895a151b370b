from stockpulse_spark.plans.registry import REGISTRY, QuerySpec, queries, oracle_sql

# importing these modules populates REGISTRY
from stockpulse_spark.plans import registry_indicators  # noqa: F401, E402
from stockpulse_spark.plans import registry_calendar  # noqa: F401, E402
from stockpulse_spark.plans import registry_llmdata  # noqa: F401, E402
from stockpulse_spark.plans import registry_misc  # noqa: F401, E402
from stockpulse_spark.plans import registry_panel  # noqa: F401, E402
from stockpulse_spark.plans import registry_streaming  # noqa: F401, E402
from stockpulse_spark.plans import registry_asof  # noqa: F401, E402
from stockpulse_spark.plans import registry_funnel  # noqa: F401, E402
from stockpulse_spark.plans import registry_sessions  # noqa: F401, E402
from stockpulse_spark.plans import registry_subqueries  # noqa: F401, E402
from stockpulse_spark.plans import registry_extras  # noqa: F401, E402
from stockpulse_spark.plans import registry_sqlapi  # noqa: F401, E402
from stockpulse_spark.plans import registry_indicators2  # noqa: F401, E402
from stockpulse_spark.plans import registry_tfidf  # noqa: F401, E402
from stockpulse_spark.plans import registry_llmpipe  # noqa: F401, E402
from stockpulse_spark.plans import registry_relops  # noqa: F401, E402
from stockpulse_spark.plans import registry_analytics  # noqa: F401, E402
from stockpulse_spark.plans import registry_tpch2  # noqa: F401, E402
from stockpulse_spark.plans import registry_bloom  # noqa: F401, E402
from stockpulse_spark.plans import registry_warehouse  # noqa: F401, E402
from stockpulse_spark.plans import registry_analytics2  # noqa: F401, E402
from stockpulse_spark.plans import registry_relops3  # noqa: F401, E402
from stockpulse_spark.plans import registry_ml  # noqa: F401, E402
from stockpulse_spark.plans import registry_analytics3  # noqa: F401, E402
from stockpulse_spark.plans import registry_tpch3  # noqa: F401, E402
from stockpulse_spark.plans import registry_tpch4  # noqa: F401, E402
from stockpulse_spark.plans import registry_corpus2  # noqa: F401, E402
from stockpulse_spark.plans import registry_mmr  # noqa: F401, E402
from stockpulse_spark.plans import registry_attrib  # noqa: F401, E402
from stockpulse_spark.plans import registry_seasonal  # noqa: F401, E402
from stockpulse_spark.plans import registry_curation3  # noqa: F401, E402
from stockpulse_spark.plans import registry_layout  # noqa: F401, E402
from stockpulse_spark.plans import registry_funnel2  # noqa: F401, E402
from stockpulse_spark.plans import registry_growth  # noqa: F401, E402
from stockpulse_spark.plans import registry_analytics4  # noqa: F401, E402
from stockpulse_spark.plans import registry_paths  # noqa: F401, E402
from stockpulse_spark.plans import registry_tpch5  # noqa: F401, E402
from stockpulse_spark.plans import registry_risk  # noqa: F401, E402
from stockpulse_spark.plans import registry_pii  # noqa: F401, E402
from stockpulse_spark.plans import registry_graph  # noqa: F401, E402
from stockpulse_spark.plans import registry_streaming3  # noqa: F401, E402
from stockpulse_spark.plans import registry_streaming2  # noqa: F401, E402
from stockpulse_spark.plans import registry_ml2  # noqa: F401, E402
from stockpulse_spark.plans import registry_profile  # noqa: F401, E402
from stockpulse_spark.plans import registry_cohort  # noqa: F401, E402
from stockpulse_spark.plans import registry_multimodal2  # noqa: F401, E402
from stockpulse_spark.plans import registry_decompose  # noqa: F401, E402
from stockpulse_spark.plans import registry_tokenizer  # noqa: F401, E402
from stockpulse_spark.plans import registry_cdc  # noqa: F401, E402
from stockpulse_spark.plans import registry_statespace  # noqa: F401, E402
from stockpulse_spark.plans import registry_robust  # noqa: F401, E402
from stockpulse_spark.plans import registry_survival  # noqa: F401, E402
from stockpulse_spark.plans import registry_mlstats  # noqa: F401, E402

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
