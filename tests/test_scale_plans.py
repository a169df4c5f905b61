"""Plan-level scale assertions: the properties that make queries survive a
100× scale-up, checked against the actual physical plans.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(QUERIES["q6_revenue_forecast"](spark, sf_dir))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24" in plan


def test_q6_column_pruning(spark, sf_dir):
    plan = _plan(QUERIES["q6_revenue_forecast"](spark, sf_dir))
    # the scan must not read the full 11-column lineitem schema
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_returnflag" not in read
    assert "l_extendedprice" in read and "l_discount" in read


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(QUERIES["topk_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 100


def test_semi_join_is_semi_in_plan(spark, sf_dir):
    plan = _plan(QUERIES["semi_customers_with_open_orders"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located bucketed join: zero shuffles — the 100 TB join strategy."""
    from data_to_parquet_spark.plans.bucketing import (
        bucketed_join_plan_has_no_exchange,
        write_bucketed,
    )

    # (warehouse dir is a static conf — tables land in ./spark-warehouse
    # and are dropped at the end)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    ok, plan = bucketed_join_plan_has_no_exchange(
        spark, "b_orders", "b_lineitem", "o_orderkey"
    )
    assert ok, f"bucketed join still shuffles:\n{plan}"
    # and the join actually works
    n = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
        .count()
    )
    assert n > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_and_partition_pruning(spark, tmp_path):
    """date-partitioned sink + partition pruning at read (the layout that
    makes time-range queries cheap at 100 TB)."""
    from pyspark.sql import functions as F

    from data_to_parquet_spark.operators.base import load_table
    from data_to_parquet_spark.sinks.parquet import to_parquet

    out = str(tmp_path / "events_by_day")
    e = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    to_parquet(e, out, partition_by=["day"])

    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    # pruned read touches one partition's rows only
    full = spark.read.parquet(out).count()
    pruned = back.count()
    assert 0 < pruned < full


def test_prefix_jaccard_never_cartesian(spark, sf_dir):
    """The set-similarity join must be a keyed join on the prefix-token
    index, never a cross/nested-loop product of the corpus with itself."""
    plan = _plan(QUERIES["neardup_jaccard_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_is_bucket_keyed(spark, sf_dir):
    """Embedding near-dup candidates must come from the sign-LSH band
    equi-join (keyed on tbl+bucket) — never an all-pairs product or a
    label-blocked quadratic join."""
    plan = _plan(QUERIES["embedding_neardup_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "label" not in plan  # blocking key is the LSH bucket, not label


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle dictionary joins broadcast — the corpus-sized
    side must not shuffle for the overlap count."""
    plan = _plan(QUERIES["contamination_ngram_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_sequence_packing_window_is_sharded(spark, sf_dir):
    """Packing must partition its running sum by shard — a global (empty)
    window partitioning would serialize the corpus through one task."""
    plan = _plan(QUERIES["sequence_packing"](spark, sf_dir))
    assert "hashpartitioning(shard" in plan


def test_aqe_splits_skewed_join_partition(spark):
    """Skew handling at 100 TB is AQE's job, not hand-rolled salting:
    verify the engine configuration actually lets AQE detect a hot key and
    split its partition. Joins a 400k-row table where ~90% of rows share
    one key against a 1k-key dim (broadcast disabled to force the
    shuffle-join regime of two large tables); the FINAL adaptive plan must
    show the skew-split join. Thresholds are lowered to make the 32-core
    test corpus register as 'large' — production defaults (256 MB) scale
    the same detection to real partition sizes."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pay"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        # toPandas executes THIS DataFrame's QueryExecution (count() would
        # execute a different plan tree and leave this one non-final)
        assert len(j.toPandas()) == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition:\n" + plan
        )
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    """Join-strategy selection must react to RUNTIME sizes, not estimates:
    a join side that is planned large (1M-row scan, above the broadcast
    threshold) but measures tiny after its filter+aggregate should be
    re-planned by AQE from sort-merge to broadcast-hash mid-query. At
    100 TB this is what saves the shuffle when a selective dimension
    filter can't be costed statically."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
    try:
        big = spark.range(0, 1_000_000).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("v")
        )
        small = (
            spark.range(0, 1_000_000)
            .select(F.col("id").alias("k"))
            .filter(F.col("k") % 10000 == 0)
            .groupBy("k")
            .agg(F.count("*").alias("c"))
        )
        j = big.join(small, "k")
        assert len(j.toPandas()) == 100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        final, _, initial = plan.partition("== Initial Plan ==")
        assert "BroadcastHashJoin" in final, (
            "AQE did not convert to broadcast:\n" + plan
        )
        # the static plan chose SMJ — proving the conversion happened at
        # runtime rather than in the initial costing
        assert "SortMergeJoin" in initial
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
