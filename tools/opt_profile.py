"""Per-query optimization profiler (r15 optimization round).

For each named query: capture `.explain("formatted")` into
``plans/r15/<name>_<tag>.txt`` and time the bench action (`.count()`)
N reps, printing rep-by-rep seconds so memo-cold vs memo-warm behavior
is visible. The session/warmup mirror bench.py so numbers are
bench-comparable.

Run: ``python tools/opt_profile.py <tag> <query> [query ...]``
     ``python tools/opt_profile.py <tag> --top N`` (slowest N from BENCH_FULL)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     OPT_REPS (default 3), OPT_NOOP=1 to also time a noop-sink write.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _warmup(spark, queries):
    """bench.py's warmup contract (JVM/codegen/Python-worker cold start)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        queries["q6_revenue_forecast"](spark, sf_dir).count()
        spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()
        warm_sf = "/root/testdata/sf0.001"
        if os.path.isdir(warm_sf):
            queries["neardup_jaccard_pairs"](spark, warm_sf).count()
            queries["dedup_minhash_pairs"](spark, warm_sf).count()
            queries["kmeans_embedding_clusters"](spark, warm_sf).count()
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    if len(sys.argv) < 3:
        sys.stderr.write(__doc__ + "\n")
        raise SystemExit(2)
    tag = sys.argv[1]
    import __spark_entry__ as entry_mod
    from data_to_parquet_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("OPT_REPS", "3"))
    do_noop = os.environ.get("OPT_NOOP") == "1"

    if sys.argv[2] == "--top":
        n = int(sys.argv[3])
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_FULL.json")) as f:
            prior = json.load(f)["queries"]
        names = [k for k, _ in sorted(prior.items(), key=lambda kv: -kv[1])
                 if not k.startswith("excel_convert")][:n]
    else:
        names = sys.argv[2:]

    spark = get_spark("opt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    _warmup(spark, queries)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("OPT_PLANS_ROUND", "r16"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"opt_profile:{name}")
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                ts.append(round(time.perf_counter() - t0, 3))
            results[name] = ts
            extra = ""
            if do_noop:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                extra = f"  noop={round(time.perf_counter() - t0, 3)}"
            print(f"{name}: {ts}{extra}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:300], flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({k: v for k, v in results.items()}))


if __name__ == "__main__":
    main()
