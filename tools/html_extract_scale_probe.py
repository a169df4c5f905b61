"""Weak-scaling steps (16x/64x) for `html_boilerplate_extract` (round 15).

The HTML extractor is the round's heaviest new per-document kernel:
markup synthesis (concat/CASE) plus five regex passes per page
(boilerplate alternation twice, tag strip, token count, alnum strip)
inside one zero-exchange narrow map. Per-doc work is constant in corpus
size, so — like the BPE probe this file mirrors — the IDEAL step
exponent is ~1.0 once fixed session overhead amortizes; sublinear steps
mean overhead still dilutes the measurement, superlinear would flag a
defect (there is no shuffle to grow, so any superlinearity would be a
scan/codegen pathology).

Corpus construction matches tools/bpe_scale_probe.py: the sf0.1
documents table unioned with doc_id-shifted copies (text byte-identical
per copy, so per-doc regex work replicates exactly). Steps start at 16x
because sf0.1 is overhead-dominated (the BPE probe's finding). One
untimed warmup of the plan template runs before the 1x reps (repo probe
rule). Run: ``python tools/html_extract_scale_probe.py`` (rewrites its
SCALING.md section).
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
ROOT = "/tmp/d2p_html_probe"
REPS = 3


def _median_runs(fn, spark, sf_dir):
    """Force the extraction columns through an aggregate: the operator
    is a pure projection, so a bare count() lets Catalyst prune every
    computed column and time an empty row count (the first run of this
    probe read FLAT 0.33 s at 1x/16x/64x that way). Summing two
    computed metrics + the row count forces all five regex passes while
    collecting only one row."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(REPS):
        t = time.time()
        row = (
            fn(spark, sf_dir)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("main_alnum_chars").alias("s1"),
                F.sum("n_links_main").alias("s2"),
                F.sum("n_main_tokens").alias("s3"),
                F.sum("n_links_total").alias("s4"),
                F.sum("html_chars").alias("s5"),
            )
            .collect()[0]
        )
        runs.append((time.time() - t, row["n"]))
    return statistics.median(r[0] for r in runs), runs[0][1]


def _build_doc_corpora(spark) -> dict[int, str]:
    """{multiple: sf_dir} for 1x/16x/64x doc_id-shifted document unions."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SRC}/documents.parquet")
    offset = d.agg(F.max("doc_id")).collect()[0][0] + 1
    dirs: dict[int, str] = {}
    for mult in (1, 16, 64):
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
        html_boilerplate_extract,
    )

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    dirs = _build_doc_corpora(spark)

    html_boilerplate_extract(spark, dirs[1]).count()  # untimed warmup

    r = {
        m: _median_runs(html_boilerplate_extract, spark, dirs[m])
        for m in (1, 16, 64)
    }

    def step_exp(lo, hi):
        return math.log(r[hi][0] / r[lo][0]) / math.log(hi / lo)

    lines = [
        "",
        "## html_boilerplate_extract — 16x/64x weak-scaling steps (round 15)",
        "",
        f"Median of {REPS} warm-session runs per point after one untimed",
        "plan-template warmup; corpora are the sf0.1 documents table",
        "unioned with doc_id-shifted copies (text byte-identical per",
        "copy, so per-doc regex work replicates exactly). The extractor",
        "is a zero-exchange narrow map — synthesis concat/CASE plus five",
        "regex passes per page — so per-doc work is constant and the",
        "ideal exponent is ~1.0 once fixed overhead amortizes; there is",
        "no shuffle to grow, so superlinearity anywhere would flag a",
        "scan/codegen pathology.",
        "",
        "| corpus | wall s | output rows | step exponent |",
        "|---|---|---|---|",
        f"| 1x (sf0.1) | {r[1][0]:.2f} | {r[1][1]} | — |",
        f"| 16x docs | {r[16][0]:.2f} | {r[16][1]} | {step_exp(1, 16):.2f} |",
        f"| 64x docs | {r[64][0]:.2f} | {r[64][1]} | {step_exp(16, 64):.2f} (16x->64x) |",
        "",
        "Marginal extraction cost (16x->64x deltas): "
        f"{(r[64][0] - r[16][0]) / (64 - 16) * 1000:.1f} ms per 1x corpus "
        "(5k docs) on 32 threads — "
        f"~{(r[64][0] - r[16][0]) / (48 * 5000) * 1e6:.0f} us per page",
        "including all five regex passes. At 100 TB this is the ingest",
        "map that writes extracted text + signals beside the raw page;",
        "it scales out embarrassingly (no exchange, pruned scan).",
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## html_boilerplate_extract — 16x/64x weak-scaling steps",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
