"""Weak-scaling steps for the incremental CC label fold
(`streaming/windows.py::_cc_fold_epochs`, the per-epoch loop behind
`streaming_cc_label_maintenance`), round 13 — the heavy-new-workload
probe rule.

The production claim: per epoch the fold pays O(|new pairs| +
|affected labels|) for the contracted CC plus ONE |docs| relabel join —
linear in corpus size, never the multi-round full-graph fixpoint. The
probe times the literal `_cc_fold_epochs` loop on synthetic
epoch-partitioned inputs at 1x/2x/4x corpus (docs AND pairs double
together; 5 epochs fixed, range-sliced arrival like the real stream),
so the expected step exponent is ~1.0 (the relabel join and the
edges-sized contraction both double); clearly super-linear would mean
the contracted CC stopped being label-graph-sized.

Pair construction mirrors a near-dup graph's shape: sparse chains —
every 10th doc links to its successor (i, i+1) and every 100th to
(i, i+2), giving ~12% of docs an edge, small multi-edge clusters, and
cross-epoch edges at the slice boundaries. Each pair lands in the epoch
its LATER member arrives (the invariant the real stream guarantees).
Correctness is asserted once per scale against the from-scratch batch
CC (`ops.connected_components` + singletons) before timing.

Run: ``python tools/cc_fold_scale_probe.py`` (idle host; check
tools/host_probe.py first).
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3
BASE_N = 200_000
EPOCHS = 5


def _inputs(spark, n: int):
    """Synthetic (pairs, arrivals) for an n-doc corpus: range-sliced
    arrival epochs, chain pairs at every 10th/100th doc, each pair
    assigned to its later member's epoch."""
    from pyspark.sql import functions as F

    per = n // EPOCHS
    docs = spark.range(n).select(
        (F.col("id") / per).cast("int").alias("epoch"),
        F.col("id").alias("doc_id"),
    ).withColumn(
        "epoch", F.least(F.col("epoch"), F.lit(EPOCHS - 1))
    )
    base = spark.range(n)
    chain1 = base.filter(
        (F.col("id") % 10 == 0) & (F.col("id") + 1 < n)
    ).select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    chain2 = base.filter(
        (F.col("id") % 100 == 0) & (F.col("id") + 2 < n)
    ).select(F.col("id").alias("doc_a"), (F.col("id") + 2).alias("doc_b"))
    pairs = chain1.unionByName(chain2).select(
        F.least(
            (F.col("doc_b") / per).cast("int"), F.lit(EPOCHS - 1)
        ).alias("epoch"),
        "doc_a",
        "doc_b",
    )
    return (
        pairs.localCheckpoint(eager=True),
        docs.localCheckpoint(eager=True),
    )


def _verify(spark, pairs, arrivals) -> None:
    from pyspark.sql import functions as F

    from data_to_parquet_spark.ops import connected_components
    from data_to_parquet_spark.streaming.windows import _cc_fold_epochs

    got = _cc_fold_epochs(spark, pairs, arrivals)
    cc = connected_components(
        pairs.select("doc_a", "doc_b"), "doc_a", "doc_b"
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("c"))
    diff = (
        got.join(cc, "doc_id", "left")
        .filter(
            F.coalesce(F.col("c"), F.col("doc_id")) != F.col("cluster_id")
        )
        .count()
    )
    if diff:
        raise SystemExit(f"fold != batch CC on {diff} docs")


def main() -> None:
    from data_to_parquet_spark import get_spark
    from data_to_parquet_spark.streaming.windows import _cc_fold_epochs

    spark = get_spark()
    rows = []
    walls_by_m: dict[int, float] = {}
    for m in (1, 2, 4):
        n = BASE_N * m
        pairs, arrivals = _inputs(spark, n)
        _verify(spark, pairs, arrivals)  # once per scale, untimed; also
        # pays the plan-template codegen (the r12 warmup lesson)
        walls = []
        for _ in range(REPS):
            t = time.time()
            n_rows = _cc_fold_epochs(spark, pairs, arrivals).count()
            walls.append(time.time() - t)
        med = statistics.median(walls)
        walls_by_m[m] = med
        exp = (
            "—"
            if m == 1
            else f"{math.log(med / walls_by_m[1]) / math.log(m):.2f}"
        )
        rows.append(f"| {n:,} docs ({EPOCHS} epochs) | {med:.2f} | {n_rows:,} | {exp} |")

    lines = [
        "",
        "## incremental CC label fold — 1x/2x/4x weak scaling (round 13)",
        "",
        f"Synthetic chain-pair corpus (docs and pairs double together, {EPOCHS}",
        f"epochs fixed), median of {REPS} runs of the literal `_cc_fold_epochs`",
        "loop after an untimed verified warmup per scale (fold == batch CC",
        "asserted before timing). Expected exponent ~1.0: the per-epoch",
        "relabel join is |docs|-linear and the contracted CC is edges-sized;",
        "super-linear would mean the label-graph contraction broke.",
        "",
        "| corpus | wall s | labeled docs | step exponent |",
        "|---|---|---|---|",
        *rows,
    ]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## incremental CC label fold — 1x/2x/4x weak scaling",
        lines,
    )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
