"""1x/2x/4x weak-scaling steps for `audio_energy_windows` (round 11,
session 2 — probing the new kernel while touching it is cheap, per the
house rule that new workload families get an above-sf0.1 record).

The kernel is two chained narrow maps (integer PCM synth -> WAV encode ->
full decode -> reduceat windowing) with no shuffle; PCM work is
irreducibly linear in total sample count, so as with the image codecs the
ideal step exponent is ~1.0 once fixed session overhead amortizes —
sublinear means the probe still measured overhead, superlinear a fan-out
defect. Sample counts are `4000 + doc_id % 4000`, uniform under the
constant doc_id shift the corpus construction uses, so the steps isolate
payload count.

Corpus construction matches tools/resize_digest_scale_probe.py: the
documents table unioned with doc_id-shifted copies.

Run: ``python tools/audio_energy_scale_probe.py``.
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
ROOT = "/tmp/d2p_audio_energy_probe"
REPS = 3


def _median_runs(fn, spark, sf_dir):
    runs = []
    for _ in range(REPS):
        t = time.time()
        n = fn(spark, sf_dir).count()
        runs.append((time.time() - t, n))
    return statistics.median(r[0] for r in runs), runs[0][1]


def _build_doc_corpora(spark) -> dict[int, str]:
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
    from data_to_parquet_spark.operators.multimodal import audio_energy_windows

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    dirs = _build_doc_corpora(spark)

    r = {m: _median_runs(audio_energy_windows, spark, dirs[m]) for m in (1, 2, 4)}

    def step_exp(lo, hi):
        return math.log(r[hi][0] / r[lo][0]) / math.log(hi / lo)

    lines = [
        "",
        "## audio_energy_windows — 1x/2x/4x weak scaling (round 11)",
        "",
        f"Median of {REPS} warm-session runs per point; corpora are the",
        "documents table unioned with doc_id-shifted copies (sample count",
        "`4000 + doc_id % 4000` is distribution-preserving under the",
        "shift, so the steps isolate payload count). The kernel is two",
        "chained narrow maps — PCM synth -> RIFF encode -> full decode ->",
        "reduceat windowing — with no shuffle; PCM byte work is payload-",
        "linear, so the ideal asymptotic exponent is ~1.0 and successive",
        "steps should rise toward it as fixed session overhead amortizes",
        "(the image-codec probes show the same signature). On a cluster",
        "the scan scales out embarrassingly.",
        "",
        "| corpus | wall s | output rows | step exponent |",
        "|---|---|---|---|",
        f"| 1x (sf0.1) | {r[1][0]:.2f} | {r[1][1]} | — |",
        f"| 2x docs | {r[2][0]:.2f} | {r[2][1]} | {step_exp(1, 2):.2f} |",
        f"| 4x docs | {r[4][0]:.2f} | {r[4][1]} | {step_exp(2, 4):.2f} (2x->4x) |",
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## audio_energy_windows — 1x/2x/4x weak scaling",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
