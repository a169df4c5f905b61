"""2x weak-scaling step for `dedup_simhash_pairs` (VERDICT r7 item 5).

Round 7 left simhash as the single most expensive bench workload (5.74 s
driver / 3.94 s idle) and the only >3.5 s dedup-family heavy without an
above-sf0.1 step exponent in SCALING.md. Same harness as
tools/dedup_scale_probe.py: doubled documents corpus (sf0.1 plus a
doc_id-shifted, token-suffixed copy — the suffix changes every token
hash, so the copy's fingerprints are independent of the originals and
the true near-dup structure duplicates rather than densifies, exactly
the step a cluster sees adding a second equal shard). Cross-shard
CANDIDATES can still arise from 16-bit band collisions — that is the
real scale behavior of the Manku banding, so the probe reports the
verified-pair count alongside wall time.

Run: ``python tools/simhash_scale_probe.py``.
"""

from __future__ import annotations

import math
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup_scale_probe import ROOT, _build_doc_corpora, _median_runs


def main() -> None:
    from data_to_parquet_spark import get_spark
    from data_to_parquet_spark.operators.dedup import dedup_simhash_pairs

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)

    dx1, dx2 = _build_doc_corpora(spark)
    s1 = _median_runs(dedup_simhash_pairs, spark, dx1)
    s2 = _median_runs(dedup_simhash_pairs, spark, dx2)
    s_exp = math.log(s2[0] / s1[0]) / math.log(2.0)

    lines = [
        "",
        "## dedup_simhash_pairs — 2x step (round 8)",
        "",
        "Same harness as the jaccard/dbscan study (cold runs, median of 3).",
        "Doubled documents corpus via a token-suffixed disjoint copy: the",
        "suffix changes every token hash, so the copy's 64-bit fingerprints",
        "are independent of the originals — true near-dup pairs duplicate;",
        "any extra candidates are genuine 16-bit band collisions, the",
        "banding's real occupancy behavior at 2x corpus.",
        "",
        "| workload | corpus | wall s | verified pairs | step exponent |",
        "|---|---|---|---|---|",
        f"| dedup_simhash_pairs | 1x (sf0.1) | {s1[0]:.2f} | {s1[1]} | — |",
        f"| dedup_simhash_pairs | 2x | {s2[0]:.2f} | {s2[1]} | {s_exp:.2f} |",
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## dedup_simhash_pairs — 2x step",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
