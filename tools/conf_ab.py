"""Interleaved A/B of runtime SQL confs over a query subset (r15).

For each rep: run every named query once under conf A, then once under
conf B (same session, alternating order per rep to cancel warm-cache
bias), and report per-query medians. Confs must be runtime-settable SQL
confs (``spark.conf.set``).

Run: ``python tools/conf_ab.py <reps> <query> [query ...]``
Env: D2P_AB_CONFS: semicolon-separated k=v pairs applied as variant B
     (variant A is the session default), e.g.
     ``D2P_AB_CONFS=spark.sql.join.preferSortMergeJoin=false``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    confs = [
        kv.split("=", 1)
        for kv in os.environ.get("D2P_AB_CONFS", "").split(";")
        if kv
    ]
    if not confs:
        raise SystemExit("set D2P_AB_CONFS")

    import __spark_entry__ as entry_mod
    from data_to_parquet_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("conf_ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    defaults = {k: spark.conf.get(k, None) for k, _ in confs}

    def set_variant(b: bool) -> None:
        for k, v in confs:
            if b:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    # warmup
    try:
        queries["q6_revenue_forecast"](spark, sf_dir).count()
        for name in names:
            queries[name](spark, sf_dir).count()
    except Exception:  # noqa: BLE001
        pass

    t: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for rep in range(reps):
        order = ("A", "B") if rep % 2 == 0 else ("B", "A")
        for variant in order:
            set_variant(variant == "B")
            for name in names:
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).count()
                t[name][variant].append(round(time.perf_counter() - t0, 3))
    set_variant(False)
    out = {}
    for name in names:
        ma = statistics.median(t[name]["A"])
        mb = statistics.median(t[name]["B"])
        out[name] = {
            "A_med": ma,
            "B_med": mb,
            "B_over_A": round(mb / ma, 3) if ma else None,
            "A": t[name]["A"],
            "B": t[name]["B"],
        }
        print(f"{name}: A={ma:.3f} B={mb:.3f} ratio={mb/ma:.2f}", flush=True)
    sa = sum(v["A_med"] for v in out.values())
    sb = sum(v["B_med"] for v in out.values())
    print(f"TOTAL medians: A={sa:.2f} B={sb:.2f} ratio={sb/sa:.3f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
