"""2x weak-scaling step for `dedup_chain_depth_report` (VERDICT r11 item
4): the multi-source BFS's claim is "per-round work bounded by |edges|",
so the measured exponent should track the pair-count exponent.

Corpus doubling reuses the disjoint-token trick of
tools/dedup_scale_probe.py (doc_id-shifted copy with `qv9`-suffixed
tokens): the copy's token sets are disjoint from the originals, so the
near-dup pair structure — and with it the edge list and the cluster set —
duplicates exactly rather than densifying. The BFS is timed with WARM
pair/label memos (they are its declared inputs — "zero cost after any
dedup query"): each timed rep pays the 6 frontier joins + the level
report, which is precisely the audit's own per-round work.

Run: ``python tools/chain_depth_scale_probe.py``.
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
ROOT = "/tmp/d2p_chain_depth_scale_probe"
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


def _measure(spark, sf_dir) -> tuple[float, int, int]:
    """(median BFS wall s over REPS, |pairs|, |levels rows|) with the
    pair/label memos warmed (untimed) first."""
    from data_to_parquet_spark.operators.dedup import (
        _cc_label_table,
        dedup_chain_depth_report,
        neardup_jaccard_pairs,
    )

    n_pairs = neardup_jaccard_pairs(spark, sf_dir).count()  # warms pairs
    _cc_label_table(spark, sf_dir).count()  # warms labels
    walls = []
    n_rows = 0
    for _ in range(REPS):
        t = time.time()
        n_rows = len(dedup_chain_depth_report(spark, sf_dir).collect())
        walls.append(time.time() - t)
    return statistics.median(walls), n_pairs, n_rows


def main() -> None:
    from data_to_parquet_spark import get_spark

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)

    x1, x2 = _build_doc_corpora(spark)
    w1, p1, r1 = _measure(spark, x1)
    w2, p2, r2 = _measure(spark, x2)
    exp_docs = math.log(w2 / w1) / math.log(2.0)
    exp_pairs = math.log(w2 / w1) / math.log(p2 / p1)

    lines = [
        "",
        "## dedup_chain_depth_report — 2x step (round 12)",
        "",
        "Doubled disjoint-token documents corpus (the jaccard-probe",
        "construction: pair structure duplicates, never densifies), BFS",
        f"timed with warm pair/label memos, median of {REPS} — the audit's",
        "own per-round cost, exactly as the bench measures it after any",
        "dedup query has run. The claim under test: frontier work is",
        "bounded by |edges|, so the wall exponent should track the",
        "pair-count exponent (pairs double by construction).",
        "",
        "| corpus | pairs | wall s | level rows | exponent |",
        "|---|---|---|---|---|",
        f"| 1x (sf0.1) | {p1} | {w1:.2f} | {r1} | — |",
        (
            f"| 2x | {p2} | {w2:.2f} | {r2} | {exp_docs:.2f} vs docs, "
            f"{exp_pairs:.2f} vs pairs |"
        ),
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## dedup_chain_depth_report — 2x step",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
