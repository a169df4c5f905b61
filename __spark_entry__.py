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
# streaming/TPCH-extra/pipeline window, round 3 the 8 never-verified + new
# queries (42/42 oracled green). Round 4 leads with this round's FIXES —
# the only never-driver-green query (events_rollup_day_hour, crashed in r3)
# and ALL SIX streaming queries (4 crashed on the regenerated NTZ testdata;
# the other 2 last ran against the old layout) — then the perf-touched
# queries (minhash/simhash/q10/sessionize precision), queries added this
# round, and green canaries from every prior window. Names listed here run
# first, in this order; the rest keep merge order.
_PRIORITY = [
    # --- round-4 fixes: never green or red last round ---
    "events_rollup_day_hour",
    "streaming_tumbling_5min",
    "streaming_session_window",
    "streaming_stateful_user_totals",
    "streaming_static_enrichment",
    "streaming_dedup_exactly_once",
    "streaming_stream_stream_join",
    # --- round-4 code-touched (perf/precision rewrites) ---
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "q10_returned_items",
    "events_sessionize_30min",
    # --- new in round 4 (driver-verify on first appearance) ---
    "events_sliding_10min",
    "streaming_sliding_10min",
    "value_histogram_events",
    "source_cap_docs",
    "pii_extract_spans",
    "dedup_incremental_new_batch",
    "lateral_top2_orders_per_customer",
    "doc_chunk_windows",
    "streaming_stream_stream_left_outer",
    "multimodal_png_manifest",
    "multimodal_resize_png",
    "winsorize_values_by_type",
    "length_gate_per_lang",
    "token_budget_sample",
    "cross_source_overlap",
    "table_profile_lineitem",
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
    # --- canaries from the round-2 window ---
    "dedup_exact_text",
    "neardup_jaccard_pairs",
    "dedup_connected_components",
    "similarity_topk_bruteforce",
    "embedding_neardup_pairs",
    "gopher_quality_gate",
    "scd2_customer_balance_merge",
    # --- canaries from the round-3 window ---
    "tfidf_top_terms",
    "dedup_keep_canonical",
    "passage_dedup_fraction",
    "semdedup_prune",
    "scalar_part_functions",
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
