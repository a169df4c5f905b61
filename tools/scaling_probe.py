"""Superlinearity probe: run representative queries at sf0.001/0.01/0.1 and
fit the wall-time growth exponent over the 100x data range.

Small-SF walls are overhead-dominated, so exponents well below 1 are
expected and prove nothing about constants — what the probe CATCHES is
accidental quadratic behavior (an all-pairs join or per-row O(n) lookup
shows exponent -> 2 long before it would OOM a cluster). Writes SCALING.md.
Run: ``python tools/scaling_probe.py``.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]

# one per operator family; the quadratic-prone ones matter most
PROBED = [
    "q1_pricing_summary",          # scan-agg
    "q3_shipping_priority",        # 3-way join
    "dedup_exact_hash",            # hash groupBy
    "neardup_jaccard_pairs",       # prefix-filter index join (quadratic if wrong)
    "embedding_neardup_pairs",     # LSH band join (quadratic if wrong)
    "event_transition_matrix",     # window + agg
    "basket_brand_pairs",          # pair fan-out (quadratic if wrong)
    "bigram_coverage_quality",     # explode + join-back
    "doc_winnow_fingerprints",     # regex+hash heavy map
    "mad_outlier_events",          # multi-pass exact medians
    "dedup_connected_components",  # iterative contraction
    "rfm_customer_segments",       # partitioned ntile windows
    # round-5 session-4 additions with quadratic-prone or iterative shapes
    "containment_neardup_pairs",   # asymmetric prefix-vs-full-index join
    "duplicated_span_coverage",    # stride-1 window explode + self-join
    "kmeans_embedding_clusters",   # iterative broadcast-assign + k*d agg
    "neardup_graph_pagerank",      # iterative edge-join propagation
    "dsir_importance_select",      # token-keyed LM join + global rank
    "dbscan_embedding_clusters",   # LSH band join + CC fixpoint
    "item_cooccurrence_recs",      # basket-size^2 pair fan-out
    # round-7 rewrites (oracle-replayable indexing) — re-probe the shapes
    "similarity_ann_lsh",          # sign-bit band join + bounded top-k
    "similarity_ann_ivf",          # distributed Lloyd + probe join
    "semdedup_prune",              # Lloyd cells + salted within-cell join
    # round-9 unfreeze shapes with quadratic-prone or funnel-prone plans
    "rerank_positional_ce",        # candidate x query-term joint scoring
]


def main() -> None:
    from data_to_parquet_spark import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark()
    queries = entry_mod.queries()
    # warm the JVM + python workers once
    queries["q1_pricing_summary"](spark, SF_DIRS[0][1]).count()

    results: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    for name in PROBED:
        results[name] = {}
        rows[name] = {}
        for sf, d in SF_DIRS:
            ts = []
            for _ in range(3):
                t = time.time()
                n = queries[name](spark, d).count()
                ts.append(time.time() - t)
            results[name][sf] = statistics.median(ts)
            rows[name][sf] = n

    lines = [
        "# SCALING.md — superlinearity probe (local[32])",
        "",
        "Median-of-3 wall seconds per scale factor; `exp` fits",
        "log(t_0.1/t_0.001)/log(100). Overhead dominates small SFs, so",
        "exp << 1 is expected; the probe exists to catch accidental",
        "quadratics (exp -> 2). Regenerate: `python tools/scaling_probe.py`.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | out rows (0.1) | exp |",
        "|---|---|---|---|---|---|",
    ]
    worst = []
    for name in PROBED:
        r = results[name]
        exp = math.log(max(r["0.1"], 1e-3) / max(r["0.001"], 1e-3)) / math.log(100)
        worst.append((exp, name))
        lines.append(
            f"| `{name}` | {r['0.001']:.2f} | {r['0.01']:.2f} | {r['0.1']:.2f} "
            f"| {rows[name]['0.1']} | {exp:.2f} |"
        )
    worst.sort(reverse=True)
    lines += [
        "",
        f"Highest exponent: `{worst[0][1]}` at {worst[0][0]:.2f} "
        "(1.0 = linear in data; > ~1.2 would warrant a plan audit).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    # Preserve the dedicated study sections other tools append (the 2x
    # weak-scaling probes write "## ..." sections after this table) —
    # this probe owns only the header + exponent table.
    tail = ""
    try:
        with open(out) as f:
            old = f.read()
        idx = old.find("\n## ")
        if idx != -1:
            tail = old[idx:]
    except OSError:
        pass
    with open(out, "w") as f:
        f.write("\n".join(lines) + tail)
    print("wrote", out)
    for e, n in worst:
        print(f"  {e:5.2f} {n}")


if __name__ == "__main__":
    main()
