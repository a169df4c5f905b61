"""Value pins for the two rows-only queries that had none (r8 VERDICT
item 7): rows-only queries get no driver hash check by design, so a pytest
value pin is their ONLY correctness evidence. approx_aggregates is pinned
by error bounds against exact in-Spark aggregates; multimodal_resize_stub
by replaying its deterministic nearest-neighbor sampling rule in plain
Python. tests/test_verification_debt.py asserts every rows-only query has
a pin file naming it."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


def test_approx_aggregates_error_bounds(spark, sf_dir):
    queries = entry_mod.queries()
    rows = {
        r["l_returnflag"]: r
        for r in queries["approx_aggregates"](spark, sf_dir).collect()
    }
    assert len(rows) == 3  # A/N/R

    from data_to_parquet_spark.operators.base import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("parts"),
            F.count_distinct("l_orderkey").alias("orders"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        e = exact[flag]
        # HLL++ practical envelopes: 3x the configured rsd (default 0.05
        # for approx_parts, 0.01 for approx_orders)
        assert abs(r["approx_parts"] - e["parts"]) <= 0.15 * e["parts"]
        assert abs(r["approx_orders"] - e["orders"]) <= 0.03 * e["orders"]
        # percentile_approx(accuracy=10000): rank-based check — the
        # fraction of group values at or below the reported quantile must
        # bracket the requested rank (loose band: ties + sketch error)
        for q, col in ((0.25, "approx_p25"), (0.5, "approx_p50"), (0.75, "approx_p75")):
            frac = (
                li.filter(
                    (F.col("l_returnflag") == flag)
                    & (F.col("l_extendedprice") <= F.lit(r[col]))
                ).count()
                / e["n"]
            )
            assert q - 0.05 <= frac <= q + 0.05, (
                f"{flag} {col}: value {r[col]} sits at rank {frac:.4f}, "
                f"requested {q}"
            )
        assert r["approx_p25"] <= r["approx_p50"] <= r["approx_p75"]

    # sketches are deterministic — the report must not flap between runs
    again = {
        r["l_returnflag"]: r
        for r in queries["approx_aggregates"](spark, sf_dir).collect()
    }
    assert {k: tuple(v) for k, v in again.items()} == {
        k: tuple(v) for k, v in rows.items()
    }


def test_multimodal_resize_stub_replay(spark, sf_dir):
    queries = entry_mod.queries()
    out = {
        r["doc_id"]: r
        for r in queries["multimodal_resize_stub"](spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert set(out) == set(docs)  # one row per document

    from data_to_parquet_spark.operators.multimodal import _TARGET

    for doc_id in sorted(docs)[:20]:
        r = out[doc_id]
        assert r["width"] == _TARGET and r["height"] == _TARGET
        # replay the stub's nearest-neighbor byte sampling over the UTF-8
        # payload — the exact kernel rule (operators/multimodal.py
        # resize_batches), so any silent kernel change trips this pin
        payload = docs[doc_id].encode("utf-8")
        n = max(len(payload), 1)
        expect = bytes(payload[(i * n) // _TARGET % n] for i in range(_TARGET))
        assert bytes(r["resized"]) == expect
        assert len(bytes(r["resized"])) == _TARGET
