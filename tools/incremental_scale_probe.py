"""2x weak-scaling step for the incremental-dedup OPERATOR
(`ops.incremental_neardup`), round 8.

The registered query derives batch AND corpus from one sf_dir, so a
naive corpus-doubling also doubles the batch and measures the product
|batch|x|corpus| — not the production question. The steady-state ingest
shape holds the BATCH FIXED (an ingest window) while the already-deduped
corpus grows, so this probe measures exactly that: the sf0.1 batch
(doc_id % 7 == 0, tokenized) against a 1x corpus (the remaining sf0.1
docs) and a 2x corpus (those plus a doc_id-shifted token-suffixed copy —
disjoint token sets, so true pairs stay identical and any extra work is
the broadcast-join streaming cost, which should be ~linear in corpus:
exponent ~1.0 is the optimal posture for a must-scan-once stream, and
> ~1.2 would mean the size-ratio prefilter stopped protecting the
intersects).

Run: ``python tools/incremental_scale_probe.py``.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from data_to_parquet_spark import get_spark
    from data_to_parquet_spark.functions.exprs import distinct_tokens
    from data_to_parquet_spark.ops import incremental_neardup

    from _md_sections import replace_section

    spark = get_spark()
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    tok = d.select(
        "doc_id", "lang", distinct_tokens(F.col("text")).alias("toks")
    )
    batch = tok.filter(F.col("doc_id") % 7 == 0).localCheckpoint()
    corpus1 = tok.filter(F.col("doc_id") % 7 != 0).localCheckpoint()
    offset = d.agg(F.max("doc_id")).collect()[0][0] + 1
    shifted = d.filter(F.col("doc_id") % 7 != 0).select(
        (F.col("doc_id") + offset).alias("doc_id"),
        "lang",
        distinct_tokens(
            F.regexp_replace("text", r"([a-zA-Z0-9]+)", r"$1qv9")
        ).alias("toks"),
    )
    corpus2 = corpus1.unionByName(shifted).localCheckpoint()

    def run(corpus):
        times, rows = [], None
        for _ in range(REPS):
            t = time.time()
            rows = incremental_neardup(
                batch, corpus, "doc_id", "toks", block_col="lang",
                threshold=0.9,
            ).count()
            times.append(time.time() - t)
        return statistics.median(times), rows

    t1, n1 = run(corpus1)
    t2, n2 = run(corpus2)
    # the probe's validity rests on this: the suffixed copy's token sets
    # are disjoint from the batch's, so true pairs must be IDENTICAL —
    # otherwise the exponent measures extra pair OUTPUT, not scan cost
    assert n1 == n2, (
        f"disjoint-copy invariant broken: 1x corpus yields {n1} pairs but "
        f"2x yields {n2} — the token-suffix transform is no longer keeping "
        f"the copy disjoint; the measurement is invalid"
    )
    exp = math.log(t2 / t1) / math.log(2.0)

    lines = [
        "",
        "## incremental_neardup — fixed batch vs 2x corpus (round 8)",
        "",
        "The production ingest question: a FIXED batch (sf0.1 docs with",
        "doc_id % 7 == 0) matched against a corpus that doubles (remaining",
        "sf0.1 docs + a token-suffixed disjoint copy; identical output",
        "pairs asserted by the probe). The cost model is the broadcast",
        "join streaming the corpus past the batch once — ~linear in",
        "corpus. Caveat: at ~2 s walls the corpus-scan term sits below",
        "local[32]'s fixed per-run overhead (run-to-run swings at this",
        "duration reach ±15% under co-tenant load — see BENCH_FULL.json's",
        "methodology notes), so a near-zero or negative step",
        "exponent here means 'scan cost not yet measurable at sf0.1', NOT",
        "'sub-linear streaming'; the linear term would emerge at larger",
        "corpora.",
        "",
        "| corpus | wall s | output pairs | step exponent |",
        "|---|---|---|---|",
        f"| 1x (sf0.1 minus batch) | {t1:.2f} | {n1} | — |",
        f"| 2x | {t2:.2f} | {n2} | {exp:.2f} |",
    ]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replace_section(
        os.path.join(here, "SCALING.md"),
        "\n## incremental_neardup — fixed batch vs 2x corpus",
        lines,
    )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
