"""Focused idle re-measure of named registry queries (drift triage).

bench.py runs all ~124 workloads, which makes one-query drift
investigations slow and noisy (the suspect runs in whatever thermal/page
-cache state the previous 80 queries left behind). This tool reproduces
bench.py's methodology for a handful of names — same sf dir resolution,
same warmup contract (one JVM/codegen pass + a mapInPandas that spins up
the Python worker pool), same count()-materialization timing — then runs
each named query REPS times and prints per-query min/median, plus the
loadavg before and after so the record shows the run was actually idle.

Usage: ``python tools/idle_remeasure.py QUERY [QUERY ...]``
(default REPS=5; override with SPARK_GRAFT_REMEASURE_REPS).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(names: list[str]) -> None:
    load_at_start = [round(x, 2) for x in os.getloadavg()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REMEASURE_REPS", "5"))

    import __spark_entry__ as entry_mod
    from data_to_parquet_spark.session import get_spark

    queries = entry_mod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    spark = get_spark("idle-remeasure")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: same contract as bench.py — one query pays JVM/codegen
    # session costs, one trivial mapInPandas spins up the worker pool
    queries["q6_revenue_forecast"](spark, sf_dir).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()

    from bench import _MEMO_SELF_CACHED, memo_family_predecessors

    out: dict[str, dict] = {}
    for name in names:
        # Self-cached memo queries (their warm reps are pure cache reads)
        # with family predecessors in bench order: reproduce the
        # bench-comparable regime — run the predecessors UNMEASURED so
        # the shared memo is warm, then time the target with its own
        # cache still cold. Its first rep then measures the same work
        # its bench prior did, and _verdicts can adjudicate BOTH
        # directions instead of punting to a manual note (the r11
        # dedup_connected_components hole).
        family_warmed: list[str] = []
        if name in _MEMO_SELF_CACHED:
            for dep in memo_family_predecessors(name):
                queries[dep](spark, sf_dir).count()
                family_warmed.append(dep)
        times = []
        rows = None
        for _ in range(reps):
            t = time.time()
            rows = queries[name](spark, sf_dir).count()
            times.append(time.time() - t)
        out[name] = {
            "min_s": round(min(times), 3),
            "median_s": round(statistics.median(times), 3),
            "all_s": [round(t, 3) for t in times],
            "rows": rows,
        }
        if family_warmed:
            out[name]["family_warmed"] = family_warmed
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "loadavg_at_start": load_at_start,
                "loadavg_at_end": [round(x, 2) for x in os.getloadavg()],
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
