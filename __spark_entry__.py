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

# The driver verifies the first 50 registry entries per round. After round
# 6, every registered query has driver contact (0 never-checked), so the
# debt is now STALENESS: 39 queries were last checked in round 1/2 (NTZ
# precedent: stale greens rot when testdata regenerates), and 5 queries
# gained full value oracles in round 5 that the driver has never confirmed
# (their latest entry predates the oracle, recorded as no_oracle).
# Round 7 window (VERDICT.md r6 item 1), in order:
# 1) the 5 unconfirmed round-5 oracle upgrades (first hash contact);
# 2) the 10 round-1-era greens;
# 3) the 26 remaining round-2-era greens (3 of the 29 are already in
#    group 1);
# 4) 2 guarded-code re-contacts (KM ln(0) guard, modularity m==0 guard —
#    behavior-preserving on current data, parity-green locally);
# 5) semdedup_prune — round-7 oracle upgrade (rows-only -> full value
#    oracle) needing first hash contact;
# 6) 6 oldest round-3-era greens (alphabetical; the remaining 17 round-3
#    greens follow after the window and roll to round 8).
# After this round no query's latest driver entry predates round 3.
_PRIORITY = [
    # --- 1) round-5 oracle upgrades the driver has never confirmed ---
    "excel_roundtrip",
    "lang_id_ngram",
    "doc_winnow_fingerprints",
    "multimodal_frame_sample",
    "streaming_stream_stream_left_outer",
    # --- 2) greens last driver-checked round 1 (10) ---
    "q19_disjunctive_predicates",
    "q22_global_sales_opportunity",
    "window_range_7day_avg",
    "window_rank_family",
    "events_tumbling_5min",
    "time_grid_fill",
    "variant_json_events",
    "window_value_functions",
    "lang_id_stopword",
    "doc_fingerprint_md5",
    # --- 3) greens last driver-checked round 2 (26 of 29; other 3 above) ---
    "approx_aggregates",
    "agg_collect_arrays",
    "regexp_parse_customer_names",
    "fuzzy_match_part_names",
    "pipeline_curate_documents",
    "split_train_val_test",
    "stratified_sample_documents",
    "dedup_exact_hash",
    "neardup_ngram_jaccard",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "embedding_array_stats",
    "similarity_ann_pq",
    "multimodal_decode_manifest",
    "multimodal_resize_stub",
    "q2_min_price_supplier",
    "q8_market_share",
    "q11_important_parts",
    "q12_shipping_delay",
    "q13_customer_distribution",
    "q16_supplier_part_cnt",
    "q20_part_promotion",
    "doc_repetition_stats",
    "sequence_packing",
    "source_mix_weights",
    "udtf_pack_bins",
    # --- 4) guarded-code re-contacts (round-6 degenerate-input guards) ---
    "kaplan_meier_view_to_purchase",
    "neardup_cluster_modularity",
    # --- 5) round-7 oracle upgrade needing first hash contact (the
    #     staleness guard forces this scheduling mechanically) ---
    "semdedup_prune",
    # --- 6) oldest round-3 greens (6 fit the window) ---
    "agg_distinct_counts",
    "anti_customers_without_orders",
    "contamination_ngram_overlap",
    "corpus_top_ngrams",
    "corpus_zipf_stats",
    "cube_part_brand_size",
    # ---- 50-slot window ends here ----
    # remaining round-3 greens (roll to round 8):
    "date_functions_orders",
    "grouping_sets_nation_segment",
    "map_json_props",
    "pii_mask_profiles",
    "q21_waiting_supplier",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "rollup_order_priority",
    "semi_customers_with_open_orders",
    "set_except_nations",
    "set_intersect_nations",
    "text_quality_stats",
    "token_count_bpe",
    "udaf_geometric_mean",
    "unigram_lm_quality",
    "window_lag_order_gap",
    "window_running_customer_revenue",
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
