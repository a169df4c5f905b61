"""Scale-posture sweep: every registered batch query must plan without a
CartesianProduct, and may use BroadcastNestedLoopJoin only where one side
is bounded by construction (explicit allowlist). This mechanically guards
the 100 TB design rule that pair generation is always blocked/bucketed —
a regression that sneaks a cross join into any query fails here, not in a
cluster.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

# Queries where a BroadcastNestedLoopJoin is the *intended* plan because one
# side is bounded by construction (a literal dim table, a fixed query set, a
# 1-row aggregate) — never corpus-sized.
ALLOW_BNLJ = {
    "range_join_quantity_bands",  # literal band table (3 rows)
    "similarity_topk_bruteforce",  # fixed query-vector set, broadcast
    "generated_embedding_topk",  # same shape over generated vectors
    "similarity_ann_lsh",  # same bounded query set
    "similarity_ann_ivf",
    "similarity_ann_pq",
    "embedding_array_stats",  # 1-row global agg joined back
    "q11_important_parts",  # 1-row scalar-subquery threshold
    "q22_global_sales_opportunity",  # 1-row avg-balance subquery
    "time_grid_fill",  # bounded hour grid from min/max
    "corpus_zipf_stats",  # 1-row corpus totals
    "unigram_lm_quality",  # 1-row vocab/total join
    "tfidf_top_terms",  # 1-row corpus doc-count N joined back
    "lang_id_ngram",  # fixed char-bigram language profiles (bounded)
    "similarity_recall_report",  # wraps the allowlisted brute-force top-k
    "basket_brand_pairs",  # 1-row grand-total order count joined back
    "graph_triangle_count",  # three 1-row scalar counts cross-joined
    "bm25_rank_queries",  # 1-row (N, avgdl) corpus aggregate joined back
    "zorder_locality_orders",  # 1-row (xmax, ymax) domain agg joined back
    "exp_smoothing_weekly_orders",  # 1-row (wk0, wk1) domain agg x priorities
    "benford_digit_check",  # 1-row grand-total joined back to 9 digit rows
    "hybrid_retrieval_rrf",  # rides bm25's allowlisted 1-row (N, avgdl) join
    "rerank_positional_ce",  # wraps hybrid_retrieval_rrf (same 1-row join)
    "holt_linear_weekly_orders",  # same 1-row (wk0, wk1) domain agg as SES
    "psi_drift_orders",  # 1-row (t_ref, t_cur) total joined back to 10 bins
    "quality_decile_schedule",  # 1-row exact-quantile thresholds joined back
    "shard_sketch_rollup",  # corpus row: three 1-row aggs joined (the
    # graph_triangle_count shape); shard rows join <=16-row aggregates
    "shard_quantile_rollup",  # merged 1-row KLL estimate broadcast back
    # for the rank scan + the same three-1-row-agg corpus row
    "source_overlap_sketch_audit",  # inequality pairing of the 20-row
    # per-source sketch-state frame with itself (bounded by |sources|^2)
    "mannwhitney_source_drift",  # 1-row total/tie aggregates joined back
}

# Streaming queries execute a real streaming run when built (availableNow to
# a memory sink), so the batch-plan sweep skips them — their plans are
# checked by their own oracle-parity runs. The excel roundtrip builds a
# workbook fixture; its (join-free) plan is covered by the source tests.
SKIP_PREFIXES = ("streaming_",)
SKIP = {"excel_roundtrip"}

_QUERIES = [
    n
    for n in entry_mod.queries()
    if not n.startswith(SKIP_PREFIXES) and n not in SKIP
]


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# Queries allowed to scan ONE source table more than twice in a single
# plan. Currently empty: a triple scan of the same table has always meant
# an unshared subtree recomputing per consumer (tfidf/unigram/hybrid all
# had one before round 7's checkpoint fixes) — checkpoint the shared frame
# instead of allowlisting, unless the query genuinely reads a table in 3+
# distinct roles.
ALLOW_TRIPLE_SCAN: set[str] = {
    # exact two-level medians are sequentially dependent: median -> MAD ->
    # flag count genuinely need three aggregation passes over the fact
    # table (docstring documents the percentile_approx swap at 100 TB)
    "mad_outlier_events",
    # three relationships read lineitem, but each scan reads a DIFFERENT
    # single FK column — per-relationship column-pruned scans ARE the
    # columnar-optimal plan; one materialization of all three columns
    # would cost more than it saves
    "fk_orphan_audit",
}


@pytest.mark.parametrize("name", _QUERIES)
def test_no_unbounded_pair_joins(name, spark, sf_dir):
    import re
    from collections import Counter

    df = entry_mod.queries()[name](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in ALLOW_BNLJ, (
            f"{name} plans a BroadcastNestedLoopJoin but is not on the "
            "bounded-side allowlist"
        )
    # duplicate-scan guard: >2 scans of one table in a single plan means a
    # shared frame is recomputing per consumer (self-joins legitimately
    # scan twice; three or more is the unshared-subtree smell)
    tables = Counter(
        loc.rstrip("/").rsplit("/", 1)[-1]
        for loc in re.findall(r"Location: InMemoryFileIndex \[([^\],]+)", plan)
    )
    worst = {t: k for t, k in tables.items() if k > 2}
    if worst and name not in ALLOW_TRIPLE_SCAN:
        raise AssertionError(
            f"{name} scans {worst} — checkpoint the shared frame "
            "(see round-7 tfidf/unigram/hybrid fixes) or allowlist"
        )
