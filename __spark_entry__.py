"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2) to a (spark, sf_dir) -> DataFrame
builder; ``oracle_sql()`` provides the DuckDB-equivalent SQL for each
SQL-expressible query (the others get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_to_parquet_spark.operators.cdc import CDC
from data_to_parquet_spark.operators.dedup import DEDUP
from data_to_parquet_spark.operators.events import EVT
from data_to_parquet_spark.operators.misc import MISC
from data_to_parquet_spark.operators.multimodal import MM
from data_to_parquet_spark.operators.pipeline import PIPE
from data_to_parquet_spark.operators.privacy import PRIV
from data_to_parquet_spark.operators.relational import REL
from data_to_parquet_spark.operators.similarity import SIM
from data_to_parquet_spark.operators.text import TXT
from data_to_parquet_spark.operators.tpch_extra import TPCH_X
from data_to_parquet_spark.streaming.windows import STREAMING

_REGISTRY = REL.merge(
    EVT, TXT, DEDUP, SIM, MM, MISC, STREAMING, CDC, TPCH_X, PIPE, PRIV
)

# The driver verifies the first 50 registry entries per round. Round 1
# checked the relational window (44 green), round 2 the dedup/similarity/
# streaming/TPCH-extra/pipeline window (38/38 oracled green). Round 3 puts
# the 8 queries that have NEVER been driver-verified in slots 1-8, keeps
# room for queries added this round right after, and fills the rest with
# green canaries drawn from both prior windows so a regression in either
# family surfaces. Names listed here run first, in this order; the rest
# keep merge order (all previously driver-green).
_PRIORITY = [
    # --- never driver-verified (rounds 1-2 additions/fixes) ---
    "tfidf_top_terms",
    "dedup_keep_canonical",
    "passage_dedup_fraction",
    "semdedup_prune",
    "corpus_top_ngrams",
    "pii_mask_profiles",
    "scalar_part_functions",
    "events_sessionize_30min",
    # --- new in round 3 (driver-verify on first appearance) ---
    "unigram_lm_quality",
    "corpus_zipf_stats",
    # --- canaries from the round-1 relational window ---
    "excel_roundtrip",
    "q1_pricing_summary",
    "q6_revenue_forecast",
    "q3_shipping_priority",
    "topk_orders",
    "window_top3_suppliers_per_nation",
    "pivot_returnflag_by_linestatus",
    "range_join_quantity_bands",
    "asof_events_latest_order",
    "grouped_map_percent_rank",
    "json_functions_events",
    "text_quality_stats",
    "token_count_bpe",
    # --- canaries from the round-2 window ---
    "dedup_exact_text",
    "neardup_jaccard_pairs",
    "dedup_connected_components",
    "similarity_topk_bruteforce",
    "embedding_neardup_pairs",
    "gopher_quality_gate",
    "contamination_ngram_overlap",
    "q9_product_profit",
    "q21_waiting_supplier",
    "streaming_tumbling_5min",
    "streaming_stream_stream_join",
    "scd2_customer_balance_merge",
    "udaf_geometric_mean",
    "map_json_props",
]


def _reorder(reg, priority):
    missing = [n for n in priority if n not in reg._queries]
    if missing:
        raise KeyError(f"priority names not in registry: {missing}")
    ordered = {n: reg._queries[n] for n in priority}
    ordered.update(
        (n, q) for n, q in reg._queries.items() if n not in ordered
    )
    reg._queries = ordered
    return reg


_REGISTRY = _reorder(_REGISTRY, _PRIORITY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_to_parquet_spark.operators.relational import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _REGISTRY.queries()


def oracle_sql() -> dict[str, str]:
    return _REGISTRY.oracles()
