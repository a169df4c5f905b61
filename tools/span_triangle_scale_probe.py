"""2x weak-scaling steps for `duplicated_span_coverage` and
`graph_triangle_count` — after round 10's bench these are the two most
expensive workloads (2.10 s / 2.15 s) without an above-sf0.1 record.

1. **duplicated_span_coverage** — stride-1 16-token spans flagged when
   the identical span occurs in another document: tokenize -> explode
   one row per window position -> span-keyed aggregate + equi-join.
   Step: doubled documents corpus where the copy is doc_id-shifted AND
   token-REVERSED. A verbatim copy would be the wrong experiment — every
   span would gain an exact twin, flipping the corpus to 100% duplicated
   and exploding the span-group join as a side effect of the corpus
   CONSTRUCTION, not its size. Reversing the copy's token order keeps
   the copy's internal duplication statistics identical to the
   original's (the dup signal is token-order-sensitive 16-grams) while
   making cross-half span collisions vanishingly rare, so the step
   isolates corpus SIZE at constant duplication rate — honest weak
   scaling. Span work is linear in window positions, so the ideal
   exponent -> 1.0 as fixed overhead amortizes (the frame-sample
   precedent; sublinear = overhead still amortizing, superlinear = a
   span-group fan-out defect).

2. **graph_triangle_count** — brand co-occurrence graph from per-order
   baskets, degree-ordered edge orientation, wedge-close join. Step:
   doubled BASKET SIZES at constant order count (the same part-remapped
   lineitem union as tools/frame_basket_scale_probe.py) — the
   adversarial direction for this plan: per-order pair fan-out grows
   ~4x, while the graph itself stays |brands| <= 25 vertices, so the
   oriented wedge/close joins must stay FLAT. A near-zero (or negative,
   within noise) exponent demonstrates the |brands|^2 bound holds for
   the triangle stage exactly as it did for the basket pair aggregates;
   an exponent near 1 would mean the pair explode dominates (still
   bounded), and >1 a defect.

Run: ``python tools/span_triangle_scale_probe.py``.
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
ROOT = "/tmp/d2p_span_triangle_probe"
REPS = 3


def _median_runs(fn, spark, sf_dir):
    runs = []
    for _ in range(REPS):
        t = time.time()
        n = fn(spark, sf_dir).count()
        runs.append((time.time() - t, n))
    return statistics.median(r[0] for r in runs), runs[0][1]


def _build_doc_corpora(spark) -> tuple[str, str]:
    """1x and 2x document corpora; the 2x half is doc_id-shifted and
    token-reversed (constant duplication rate, no cross-half spans)."""
    from pyspark.sql import functions as F

    x1 = os.path.join(ROOT, "docs_x1")
    x2 = os.path.join(ROOT, "docs_x2")
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    d.write.parquet(f"{x1}/documents.parquet")
    offset = d.agg(F.max("doc_id")).collect()[0][0] + 1
    reversed_copy = d.select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.col("text"), " ")), " ").alias(
            "text"
        ),
        *[c for c in d.columns if c not in ("doc_id", "text")],
    ).select(*d.columns)
    d.unionByName(reversed_copy).write.parquet(f"{x2}/documents.parquet")
    return x1, x2


def _build_basket_corpora(spark) -> tuple[str, str]:
    """Same construction as tools/frame_basket_scale_probe.py: lineitem
    unioned with a part-remapped copy (same orders, ~2x basket sizes)."""
    from pyspark.sql import functions as F

    x1 = os.path.join(ROOT, "baskets_x1")
    x2 = os.path.join(ROOT, "baskets_x2")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    p = spark.read.parquet(f"{SRC}/part.parquet")
    for x in (x1, x2):
        p.write.parquet(f"{x}/part.parquet")
    li.write.parquet(f"{x1}/lineitem.parquet")
    maxpk = p.agg(F.max("p_partkey")).collect()[0][0]
    remapped = li.withColumn(
        "l_partkey",
        (F.col("l_partkey") * 7 + 13) % F.lit(maxpk) + 1,
    ).select(*li.columns)
    li.unionByName(remapped).write.parquet(f"{x2}/lineitem.parquet")
    return x1, x2


def main() -> None:
    from data_to_parquet_spark import get_spark
    from data_to_parquet_spark.operators.dedup import (
        duplicated_span_coverage,
    )
    from data_to_parquet_spark.operators.tpch_extra import (
        graph_triangle_count,
    )

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)

    dx1, dx2 = _build_doc_corpora(spark)
    s1 = _median_runs(duplicated_span_coverage, spark, dx1)
    s2 = _median_runs(duplicated_span_coverage, spark, dx2)
    s_exp = math.log(s2[0] / s1[0]) / math.log(2.0)

    bx1, bx2 = _build_basket_corpora(spark)
    t1 = _median_runs(graph_triangle_count, spark, bx1)
    t2 = _median_runs(graph_triangle_count, spark, bx2)
    t_exp = math.log(t2[0] / t1[0]) / math.log(2.0)

    lines = [
        "",
        "## duplicated_span_coverage / graph_triangle_count — 2x steps (round 10)",
        "",
        f"Median of {REPS} warm-session runs each. Span coverage: doubled",
        "documents where the copy is doc_id-shifted and token-REVERSED —",
        "constant duplication rate, no cross-half span collisions, so the",
        "step isolates corpus size (a verbatim copy would flip the corpus",
        "to 100% duplicated and measure the construction, not the scale).",
        "Span work is linear in window positions: ideal exponent -> 1.0",
        "as fixed overhead amortizes. Triangle count: doubled BASKET",
        "sizes at constant order count (part-remapped lineitem union),",
        "the adversarial direction — per-order pair fan-out grows ~4x",
        "while the brand graph stays <= 25 vertices, so the oriented",
        "wedge/close joins must stay flat; the exponent is taken against",
        "the 2x lineitem growth.",
        "",
        "| workload | corpus | wall s | output rows | step exponent |",
        "|---|---|---|---|---|",
        f"| duplicated_span_coverage | 1x (sf0.1) | {s1[0]:.2f} | {s1[1]} | — |",
        f"| duplicated_span_coverage | 2x docs | {s2[0]:.2f} | {s2[1]} | {s_exp:.2f} |",
        f"| graph_triangle_count | 1x (sf0.1) | {t1[0]:.2f} | {t1[1]} | — |",
        f"| graph_triangle_count | 2x basket | {t2[0]:.2f} | {t2[1]} | {t_exp:.2f} |",
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## duplicated_span_coverage / graph_triangle_count — 2x steps",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
