"""2x weak-scaling steps for `multimodal_frame_sample` and the two basket
pair workloads `basket_brand_pairs` / `item_cooccurrence_recs` (VERDICT r8
items 4 and 5).

1. **multimodal_frame_sample** — the most expensive workload without an
   above-sf0.1 record (2.81 s, r8 driver). Decode-bound pandas kernel over
   two chained narrow maps (synth GIF -> decode + sample), no shuffle: wall
   time should scale with PAYLOAD COUNT, not frame fan-out. Step: doubled
   documents corpus via a doc_id-shifted copy (the kernel synthesizes from
   doc_id alone; the shift preserves the ``2 + doc_id % 6`` frame-count
   distribution, so per-payload work is identical and the only growth is
   payload count).

2. **basket_brand_pairs / item_cooccurrence_recs** — sf-range exponents
   0.18 / 0.25, the two highest non-output-bound entries in SCALING.md's
   base table. Both claim |brands|^2-bounded pair aggregates with
   per-order fan-out bounded by basket size squared. Step: double BASKET
   SIZES at constant order count — union lineitem with a copy whose
   partkeys are remapped to other parts (same orderkey), so each order's
   distinct-brand set roughly doubles while the brand domain (25) is
   unchanged. This is the adversarial direction for these plans (fan-out
   grows ~4x per order, the |brands|^2 aggregate must stay flat); a
   cluster adding wider baskets sees exactly this step. The probe reports
   the measured mean basket size at 1x and 2x alongside wall time, and
   the step exponent is taken against the 2x LINEITEM growth.

Run: ``python tools/frame_basket_scale_probe.py``.
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
ROOT = "/tmp/d2p_frame_basket_probe"
REPS = 3


def _median_runs(fn, spark, sf_dir):
    runs = []
    for _ in range(REPS):
        t = time.time()
        n = fn(spark, sf_dir).count()
        runs.append((time.time() - t, n))
    return statistics.median(r[0] for r in runs), runs[0][1]


def _build_doc_corpora(spark) -> tuple[str, str]:
    from pyspark.sql import functions as F

    x1 = os.path.join(ROOT, "docs_x1")
    x2 = os.path.join(ROOT, "docs_x2")
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    d.write.parquet(f"{x1}/documents.parquet")
    offset = d.agg(F.max("doc_id")).collect()[0][0] + 1
    # offset is a multiple-of-6 question only for the frame-count mix; the
    # kernel's per-doc work depends on doc_id % 6 and % 48 / % 36 (canvas
    # dims), all roughly uniform under a constant shift
    shifted = d.select(
        (F.col("doc_id") + offset).alias("doc_id"),
        *[c for c in d.columns if c != "doc_id"],
    ).select(*d.columns)
    d.unionByName(shifted).write.parquet(f"{x2}/documents.parquet")
    return x1, x2


def _build_basket_corpora(spark) -> tuple[str, str]:
    from pyspark.sql import functions as F

    x1 = os.path.join(ROOT, "baskets_x1")
    x2 = os.path.join(ROOT, "baskets_x2")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    p = spark.read.parquet(f"{SRC}/part.parquet")
    for x in (x1, x2):
        p.write.parquet(f"{x}/part.parquet")
    li.write.parquet(f"{x1}/lineitem.parquet")
    maxpk = p.agg(F.max("p_partkey")).collect()[0][0]
    # remap each line to a different part (same order): multiply-shift mod
    # the part domain lands on a valid partkey with a different brand for
    # most lines, roughly doubling every order's distinct-brand set
    remapped = li.withColumn(
        "l_partkey",
        (F.col("l_partkey") * 7 + 13) % F.lit(maxpk) + 1,
    ).select(*li.columns)
    li.unionByName(remapped).write.parquet(f"{x2}/lineitem.parquet")
    return x1, x2


def _mean_basket_brands(spark, sf_dir) -> float:
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    per_order = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(F.count_distinct("p_brand").alias("nb"))
    )
    return per_order.agg(F.avg("nb")).collect()[0][0]


def main() -> None:
    from data_to_parquet_spark import get_spark
    from data_to_parquet_spark.operators.multimodal import (
        multimodal_frame_sample,
    )
    from data_to_parquet_spark.operators.tpch_extra import (
        basket_brand_pairs,
        item_cooccurrence_recs,
    )

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)

    dx1, dx2 = _build_doc_corpora(spark)
    f1 = _median_runs(multimodal_frame_sample, spark, dx1)
    f2 = _median_runs(multimodal_frame_sample, spark, dx2)
    f_exp = math.log(f2[0] / f1[0]) / math.log(2.0)

    bx1, bx2 = _build_basket_corpora(spark)
    mb1 = _mean_basket_brands(spark, bx1)
    mb2 = _mean_basket_brands(spark, bx2)
    b1 = _median_runs(basket_brand_pairs, spark, bx1)
    b2 = _median_runs(basket_brand_pairs, spark, bx2)
    b_exp = math.log(b2[0] / b1[0]) / math.log(2.0)
    c1 = _median_runs(item_cooccurrence_recs, spark, bx1)
    c2 = _median_runs(item_cooccurrence_recs, spark, bx2)
    c_exp = math.log(c2[0] / c1[0]) / math.log(2.0)

    lines = [
        "",
        "## multimodal_frame_sample / basket pair workloads — 2x steps (round 9)",
        "",
        f"Median of {REPS} warm-session runs each. Frame sampling: doubled",
        "documents corpus (doc_id-shifted copy; the kernel synthesizes from",
        "doc_id, and the shift preserves the frame-count mix, so the step",
        "isolates payload count — the claim is wall time tracks payloads,",
        "not frame fan-out). Basket workloads: doubled BASKET SIZES at",
        "constant order count (lineitem unioned with a part-remapped copy),",
        "the adversarial direction for the |brands|^2-bounded pair plans —",
        f"mean distinct brands/order {mb1:.2f} -> {mb2:.2f}; exponents",
        "are taken against the 2x lineitem growth.",
        "",
        "Reading the frame-sample exponent: decode work is irreducibly",
        "linear in payloads, so the IDEAL step here is ~1.0x marginal",
        "work (exponent -> 1 as fixed session overhead amortizes) — a",
        "sublinear exponent would mean the probe measured overhead, and a",
        "superlinear one a fan-out defect. On a cluster this workload",
        "scales out embarrassingly (narrow maps, no shuffle).",
        "",
        "| workload | corpus | wall s | output rows | step exponent |",
        "|---|---|---|---|---|",
        f"| multimodal_frame_sample | 1x (sf0.1) | {f1[0]:.2f} | {f1[1]} | — |",
        f"| multimodal_frame_sample | 2x docs | {f2[0]:.2f} | {f2[1]} | {f_exp:.2f} |",
        f"| basket_brand_pairs | 1x (sf0.1) | {b1[0]:.2f} | {b1[1]} | — |",
        f"| basket_brand_pairs | 2x basket | {b2[0]:.2f} | {b2[1]} | {b_exp:.2f} |",
        f"| item_cooccurrence_recs | 1x (sf0.1) | {c1[0]:.2f} | {c1[1]} | — |",
        f"| item_cooccurrence_recs | 2x basket | {c2[0]:.2f} | {c2[1]} | {c_exp:.2f} |",
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## multimodal_frame_sample / basket pair workloads — 2x steps",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
