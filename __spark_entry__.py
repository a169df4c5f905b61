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

# The driver verifies the first 50 registry entries per round. Rounds 1-5
# covered 170 of the 209 registered queries; round 5 spent its window on
# first-contact of new queries, leaving 39 never-driver-checked and 19
# round-1-era stale greens. Round 6 is the verification-debt round
# (VERDICT.md r5 item 1): the entire 50-slot window goes to
# 1) the 39 never-driver-checked round-5 queries (all local-parity green
#    at sf0.001 AND sf0.01);
# 2) neardup_graph_pagerank and kmeans_embedding_clusters — re-contacts:
#    both upgraded rows-only -> full value oracle this round (VERDICT
#    item 6);
# 3) the 9 oldest round-1 greens (NTZ precedent: stale greens rot when
#    testdata regenerates). The remaining 10 round-1 + 29 round-2 greens
#    follow immediately after the window and roll to round 7.
_PRIORITY = [
    # --- 39 never-driver-checked (round-5 additions; first contact) ---
    "jsonl_ingest",
    "csv_ingest",
    "gdpr_erasure_audit",
    "k_anonymity_audit",
    "compression_ratio_signal",
    "part_hierarchy_rollup",
    "snapshot_diff_customers",
    "mad_outlier_events",
    "streaming_chained_windows",
    "clamped_running_balance",
    "orc_roundtrip",
    "scd2_point_in_time_join",
    "weighted_sample_topk",
    "unicode_normalize_names",
    "graph_triangle_count",
    "session_dwell_bounce",
    "cusum_changepoint_daily",
    "xml_ingest",
    "text_source_roundtrip",
    "dedup_minhash_md5_pairs",
    "dedup_simhash_md5_pairs",
    "multimodal_mixed_manifest",
    "multimodal_wav_manifest",
    "multimodal_pixel_stats",
    "passage_dedup_rewrite",
    "set_intersect_all_nations",
    "set_except_all_nations",
    "full_outer_nation_activity",
    "contamination_bloom_flags",
    "similarity_recall_report",
    "multimodal_resize_pixel_sums",
    "streaming_global_topk_users",
    "bpe_first_merges",
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
    "dq_check_lineitem",
    "incremental_agg_merge",
    "hourly_anomaly_zscores",
    "cardinality_sketch_report",
    # --- re-contacts: rows-only -> full oracle upgrades this round ---
    "neardup_graph_pagerank",
    "kmeans_embedding_clusters",
    # --- oldest greens, last driver-checked round 1 (10 fit the window) ---
    "unpivot_part_measures",
    "q17_small_quantity_revenue",
    "percentile_prices_by_flag",
    "q4_late_shipment_priority",
    "q7_nation_volume",
    "q14_promo_revenue_ratio",
    "q18_large_orders",
    "scalar_null_handling",
    "q15_top_supplier",
    # ---- 50-slot window ends here ----
    "q19_disjunctive_predicates",
    # round-6 guarded-code re-contacts (KM ln(0) guard, modularity m==0
    # guard — behavior-preserving on current data, parity-green locally):
    "kaplan_meier_view_to_purchase",
    "neardup_cluster_modularity",
    # remaining round-1 greens (roll to round 7):
    "q22_global_sales_opportunity",
    "window_range_7day_avg",
    "window_rank_family",
    "events_tumbling_5min",
    "time_grid_fill",
    "variant_json_events",
    "window_value_functions",
    "lang_id_stopword",
    "doc_fingerprint_md5",
    # round-2 greens (roll to round 7):
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
