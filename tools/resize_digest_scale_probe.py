"""2x/4x weak-scaling steps for `multimodal_resize_digest`, plus a 4x
re-probe of `multimodal_frame_sample` (VERDICT r9 item 3 + r9 ADVICE).

`multimodal_resize_digest` (4.13 s, r9 driver) became the most expensive
workload without an above-sf0.1 record: encode -> decode -> nearest
resample -> re-encode -> decode across two chained narrow maps, zero
shuffle. Decode/encode work is irreducibly linear in payload count, so —
as SCALING.md's frame-sample section defines — the IDEAL step exponent
here is ~1.0 (marginal work tracks payloads once fixed session overhead
has amortized); sublinear means the probe still measured overhead,
superlinear a fan-out defect.

The r9 ADVICE called out that frame sampling's single 2x step (0.72) was
summarized as "the ideal" when it is actually still overhead-diluted.
This probe measures SUCCESSIVE steps (1x -> 2x -> 4x) for both kernels:
if the overhead story is right, the 2x -> 4x exponent must sit closer to
1.0 than the 1x -> 2x one, confirming the asymptote instead of
hand-waving it.

Corpus construction matches tools/frame_basket_scale_probe.py: the
documents table unioned with doc_id-shifted copies. Both kernels
synthesize payloads from doc_id alone (dims `16 + doc_id % 48` /
`12 + doc_id % 36`, frame count `2 + doc_id % 6`), all roughly uniform
under a constant shift, so per-payload work is distribution-identical
and the steps isolate payload COUNT.

Run: ``python tools/resize_digest_scale_probe.py``.
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
ROOT = "/tmp/d2p_resize_digest_probe"
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
    from data_to_parquet_spark.operators.multimodal import (
        multimodal_frame_sample,
        multimodal_resize_digest,
    )

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    dirs = _build_doc_corpora(spark)

    results: dict[str, dict[int, tuple[float, int]]] = {}
    for name, fn in (
        ("multimodal_resize_digest", multimodal_resize_digest),
        ("multimodal_frame_sample", multimodal_frame_sample),
    ):
        results[name] = {m: _median_runs(fn, spark, dirs[m]) for m in (1, 2, 4)}

    def step_exp(r, lo, hi):
        return math.log(r[hi][0] / r[lo][0]) / math.log(hi / lo)

    lines = [
        "",
        "## multimodal_resize_digest / frame_sample — successive 2x steps (round 10)",
        "",
        f"Median of {REPS} warm-session runs per point; corpora are the",
        "documents table unioned with doc_id-shifted copies (payload work",
        "is synthesized from doc_id with distribution-preserving shifts,",
        "so the steps isolate payload count). Both kernels are chained",
        "narrow maps with no shuffle; decode/encode work is irreducibly",
        "payload-linear, so the ideal exponent is ~1.0 once fixed session",
        "overhead amortizes. Successive steps separate the two stories:",
        "an overhead-diluted kernel shows exponent rising TOWARD 1.0 from",
        "1x->2x to 2x->4x (r9 ADVICE asked for exactly this confirmation",
        "after the lone 0.72 frame-sample step); a superlinear trend would",
        "flag a fan-out defect. On a cluster both scale out embarrassingly.",
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

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## multimodal_resize_digest / frame_sample — successive 2x steps",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
