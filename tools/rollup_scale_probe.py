"""2x weak-scaling steps for the round-12 mergeable-sketch queries
(`shard_sketch_rollup`, `shard_quantile_rollup`,
`source_overlap_sketch_audit`).

Corpus doubling reuses the disjoint-token construction of
tools/dedup_scale_probe.py: the `qv9`-suffixed copy's tokens (hence its
3-shingles) are disjoint from the originals, so the shingle vocabulary
and the doc count both double exactly — the same weak-scaling step a
cluster sees adding a second equal shard. Each rep re-runs the full
query (none of the three holds a session memo), timed to `.collect()`
of the bounded (<=17 or <=190 row) result.

Run: ``python tools/rollup_scale_probe.py``.
"""

from __future__ import annotations

import math
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/d2p_rollup_scale_probe"
REPS = 3


def _build_doc_corpora(spark) -> tuple[str, str]:
    from pyspark.sql import functions as F

    x1 = os.path.join(ROOT, "docs_x1")
    x2 = os.path.join(ROOT, "docs_x2")
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    d.write.parquet(f"{x1}/documents.parquet")
    offset = d.agg(F.max("doc_id")).collect()[0][0] + 1
    shifted = d.select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.regexp_replace("text", r"([a-zA-Z0-9]+)", r"$1qv9").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    d.unionByName(shifted).write.parquet(f"{x2}/documents.parquet")
    return x1, x2


def _median(fn, spark, sf_dir) -> tuple[float, int]:
    walls, n = [], 0
    for _ in range(REPS):
        t = time.time()
        n = len(fn(spark, sf_dir).collect())
        walls.append(time.time() - t)
    return statistics.median(walls), n


def main() -> None:
    from data_to_parquet_spark import get_spark
    from data_to_parquet_spark.operators.pipeline import (
        shard_quantile_rollup,
        shard_sketch_rollup,
        source_overlap_sketch_audit,
    )

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    x1, x2 = _build_doc_corpora(spark)

    rows = []
    for label, fn in (
        ("shard_sketch_rollup", shard_sketch_rollup),
        ("shard_quantile_rollup", shard_quantile_rollup),
        ("source_overlap_sketch_audit", source_overlap_sketch_audit),
    ):
        # untimed warmup: the plan template's one-time codegen/JIT would
        # otherwise land entirely in the 1x reps and fake a negative
        # exponent (observed -0.44 on the first probe run)
        fn(spark, x1).collect()
        w1, n1 = _median(fn, spark, x1)
        w2, n2 = _median(fn, spark, x2)
        exp = math.log(w2 / w1) / math.log(2.0)
        rows.append(f"| {label} | 1x (sf0.1) | {w1:.2f} | {n1} | — |")
        rows.append(f"| {label} | 2x | {w2:.2f} | {n2} | {exp:.2f} |")

    lines = [
        "",
        "## shard rollups (HLL / KLL) — 2x steps (round 12)",
        "",
        "Doubled disjoint-token documents corpus (vocabulary and doc",
        f"count double exactly), median of {REPS} full re-runs. Both",
        "rollups are one corpus-scale exchange plus <=17-row sketch",
        "work, so the exponent should track the scan, not the merge —",
        "the merge side is fixed-size state by construction.",
        "",
        "| workload | corpus | wall s | rows | step exponent |",
        "|---|---|---|---|---|",
        *rows,
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## shard rollups (HLL / KLL) — 2x steps",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
