"""Generate EXPLAIN.md: a physical-plan audit of the headline queries.

For each audited query: join strategies chosen, pushed filters, read schemas
(column pruning evidence), exchange count, and the formatted plan for the
flagship. Run: ``python tools/plan_audit.py [sf_dir]`` — rewrites EXPLAIN.md.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q18_large_orders",
    "topk_orders",
    "semi_customers_with_open_orders",
    "window_top3_suppliers_per_nation",
    "asof_events_latest_order",
    "events_sessionize_30min",
    "neardup_jaccard_pairs",
    "neardup_ngram_jaccard",
    "similarity_topk_bruteforce",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "embedding_neardup_pairs",
    "q2_min_price_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q16_supplier_part_cnt",
    "q21_waiting_supplier",
    "passage_dedup_fraction",
    "corpus_top_ngrams",
    "tfidf_top_terms",
    "pii_mask_profiles",
    "semdedup_prune",
    # round 4: broadcast-hint removal + new operators
    "q10_returned_items",
    "events_sliding_10min",
    "value_histogram_events",
    "source_cap_docs",
    "pii_extract_spans",
    "dedup_incremental_new_batch",
    "events_rollup_day_hour",
    "lateral_top2_orders_per_customer",
    "doc_chunk_windows",
    "winsorize_values_by_type",
    "length_gate_per_lang",
    "multimodal_png_manifest",
    # round 5: rewritten / newly-oracled paths
    "dedup_connected_components",
    "cross_source_overlap",
    "lang_id_ngram",
    "doc_winnow_fingerprints",
    "pii_extract_spans",
    "multimodal_mixed_manifest",
    "multimodal_wav_manifest",
    "multimodal_frame_sample",
    "multimodal_pixel_stats",
    # round 7: ANN queries rewritten for oracle-replayable indexing
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    # round 5 session 2: new analytics / sources / privacy operators
    "event_transition_matrix",
    "rfm_customer_segments",
    "basket_brand_pairs",
    "order_trend_by_priority",
    "bigram_coverage_quality",
    "image_dhash_neardup",
    "jsonl_ingest",
    "csv_ingest",
    "gdpr_erasure_audit",
    "k_anonymity_audit",
    "compression_ratio_signal",
    "part_hierarchy_rollup",
    "snapshot_diff_customers",
    "mad_outlier_events",
    "clamped_running_balance",
    "orc_roundtrip",
    "scd2_point_in_time_join",
    "weighted_sample_topk",
    "unicode_normalize_names",
    "graph_triangle_count",
    "session_dwell_bounce",
    "cusum_changepoint_daily",
    # round-5 sessions 3-4
    "bm25_rank_queries",
    "inverted_index_postings",
    "skew_salted_agg_events",
    "zorder_locality_orders",
    "neardup_graph_pagerank",
    "containment_neardup_pairs",
    "duplicated_span_coverage",
    "l_diversity_audit",
    "dp_noisy_counts",
    "kmeans_embedding_clusters",
    "dsir_importance_select",
    "benford_digit_check",
    "correlation_matrix_lineitem",
    "embedding_dim_profile",
    "chisq_independence_orders",
    "hybrid_retrieval_rrf",
    "fk_orphan_audit",
    "quantile_normalize_lengths",
    "seasonal_decompose_weekly",
    "kaplan_meier_view_to_purchase",
    "ab_conversion_ztest",
    "theilsen_trend_by_priority",
    "item_cooccurrence_recs",
    "dbscan_embedding_clusters",
    "readability_flesch",
    "logrank_test_by_arm",
    # round 9: the unfreeze set
    "excel_multisheet_union",
    "rerank_positional_ce",
    "split_leakage_audit",
    "multimodal_resize_digest",
    # round 10: model-scored quality gate + int8 quantization audit +
    # the bloom oracle-upgrade audit. pca_variance_report,
    # als_convergence_report, and the r11 pq_reconstruction_audit /
    # ivfpq_selectivity_audit are deliberately NOT audited: each returns
    # a driver-local one-row createDataFrame, so their explained plan is
    # a vacuous LocalTableScan while the audit would pay the full
    # distributed fit per regeneration (r10 second-pass review).
    "quality_model_score",
    "embedding_int8_quantize_audit",
    "contamination_bloom_audit",
    "quantile_sketch_report",
    # round 11: the embed stage (same scan-side narrow shape as
    # quality_model_score) + the end-to-end embed->search top-k
    "embedding_generate_hashed",
    "generated_embedding_topk",
    "similarity_ann_ivfpq",
    # round 11 (session 2): t-closeness (one corpus shuffle, then
    # |classes|x|bands| grid work) + last-touch attribution (one window
    # shuffle on user_id, no self-join)
    "t_closeness_audit",
    "attribution_last_touch",
    # audio feature extraction: two chained narrow maps, no shuffle
    "audio_energy_windows",
    # shard manifest: one map-side-combined groupBy into 16 groups
    "training_shard_manifest",
    # chain-depth BFS: memoized inputs (0-scan plan like pagerank),
    # 6 frontier join rounds, no cartesian
    "dedup_chain_depth_report",
    # round 12: mergeable-sketch rollup — one corpus-scale distinct on
    # (shard, shingle), then <=17-row sketch/union work.
    # streaming_ivfpq_index_growth is deliberately NOT audited: its plan
    # reads the session's temp parquet accumulator (a multi-job streaming
    # artifact, not single-plan auditable — the pq_reconstruction_audit
    # precedent at the comment above). streaming_ivfpq_index_serving
    # (r13) likewise — it searches that same accumulator; its search
    # kernel's plan is audited via similarity_ann_ivfpq.
    # compact_upsert_snapshot / compact_upsert_incremental (r13)
    # likewise — a multi-job foreachBatch delta chain plus tiny folds;
    # the folds' groupBy shape is the batch suite's bread and butter.
    # streaming_cc_label_maintenance (r13) likewise — an epoch loop of
    # eager CC jobs over the stream's accumulators; the batch CC plan is
    # audited via dedup_connected_components.
    "shard_sketch_rollup",
    # the KLL sibling: one map-side sketch agg + two bounded rank scans
    "shard_quantile_rollup",
    # theta set-ops: one (source, shingle) distinct, then 20-row sketch
    # states and a |sources|^2 pair frame
    "source_overlap_sketch_audit",
    # histogram-ranked Mann-Whitney: two map-side aggregates, a ~60-row
    # broadcast rank table, 1-row totals joined back
    "mannwhitney_source_drift",
    # cluster purity: memoized labels (0-scan like pagerank) + two aggs
    "neardup_cluster_purity",
    # round 13: repetition metrics must stay a pure narrow map (the
    # longest-equal-run fold happens inside the project, no exchange);
    # the apportionment is one map-side-combined groupBy then 20-row
    # window work
    "doc_repetition_metrics",
    "mixture_token_allocation",
    # round 14: BPE encoding must stay a pure narrow map into one
    # map-side-combined groupBy (the 16-replace chain lives inside the
    # project); the domain pair is one groupBy + window-on-|domains|
    # (mix report) and one hash shuffle on domain for the cap rank
    "bpe_apply_merges",
    "bpe_fertility_by_lang",
    "domain_mix_report",
    "domain_cap_docs",
    # round 15: the trie-agreement audit must read as one scan + one
    # ArrowEvalPython stage + a 1-row global agg (no join — both
    # encoders run in the SAME project over the exploded tokens); the
    # deny-list filter is one scan into a |rules|+1-row agg + tiny
    # window; the HTML extractor must be a pure narrow map with zero
    # exchanges and a (doc_id, text)-pruned scan
    "bpe_trie_encoder_agreement",
    "url_denylist_filter",
    "html_boilerplate_extract",
    # the outlink graph is the canonical two-shuffle edge-list build:
    # explode + map-side-combined groupBy(dst), degrees re-joined on
    # doc_id — no broadcast of anything corpus-sized, pruned scan
    "html_outlink_graph",
]


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from data_to_parquet_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    lines = [
        "# EXPLAIN — physical-plan audit of headline queries",
        "",
        f"Generated by `tools/plan_audit.py` against `{sf_dir}` "
        "(regenerate after plan-shape changes).",
        "",
        "Reading note: queries whose shared frames are `localCheckpoint`-"
        "materialized",
        "(the round-7 duplicate-scan elimination) report `0 scans` / "
        "`0/0 pruned`",
        "here — the parquet scan, with its pushed filters and pruned "
        "columns, runs",
        "once inside the checkpointed subplan and the audited final plan "
        "consumes the",
        "materialized RDD. The pushdown still happens (the checkpoint's "
        "own scan is",
        "filter-pushed and column-pruned exactly as before); it is just "
        "no longer",
        "visible in the consumer plan this table audits. "
        "`tests/test_plan_sweep.py`",
        "guards the inverse property (no table scanned >2x in any single "
        "plan).",
        "",
        "| query | joins | exchanges | pushed filters | pruned scans |",
        "|---|---|---|---|---|",
    ]
    details: list[str] = []
    for name in AUDITED:
        plan = _plan(queries[name](spark, sf_dir))
        joins = []
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin"):
            c = plan.count(j)
            if c:
                joins.append(f"{j}×{c}")
        n_exchange = plan.count("Exchange")
        pushed = sum(
            1
            for l in plan.splitlines()
            if "PushedFilters" in l and "[]" not in l
        )
        reads = [
            l.split("ReadSchema:")[1].strip()
            for l in plan.splitlines()
            if "ReadSchema" in l
        ]
        pruned = sum(1 for r in reads if r.count(",") + 1 < 11)
        lines.append(
            f"| `{name}` | {', '.join(joins) or '—'} | {n_exchange} "
            f"| {pushed} scans | {pruned}/{len(reads)} scans pruned |"
        )
    flagship = _plan(queries["q3_shipping_priority"](spark, sf_dir))
    details += [
        "",
        "## Flagship plan: q3_shipping_priority",
        "",
        "```",
        flagship.strip(),
        "```",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md")
    with open(out, "w") as f:
        f.write("\n".join(lines + details))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
