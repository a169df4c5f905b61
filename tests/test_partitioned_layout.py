"""Pins for the hive-partitioned layout (`partitioned_write_pruning`):
the on-disk directory-per-value layout, and — the part that matters at
100 TB — that a partition-column predicate becomes a planning-time
PartitionFilter (pruning via directory listing), not a post-scan filter
over all files.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_partitioned(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    return out


def test_layout_is_directory_per_value(spark, sf_dir, tmp_path):
    out = _write_partitioned(spark, sf_dir, tmp_path)
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("event_type=")
    )
    assert dirs == [
        "event_type=click",
        "event_type=error",
        "event_type=purchase",
        "event_type=signup",
        "event_type=view",
    ]


def test_partition_predicate_prunes_at_planning(spark, sf_dir, tmp_path):
    out = _write_partitioned(spark, sf_dir, tmp_path)
    df = spark.read.parquet(out).filter(
        F.col("event_type").isin("click", "purchase")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the predicate must appear as a PartitionFilter on the scan node —
    # directory-level pruning decided at planning time ...
    assert "PartitionFilters" in plan
    pf = plan[plan.index("PartitionFilters") :].split("]", 1)[0]
    assert "event_type" in pf, pf
    # ... not as a data Filter above a full scan
    n = df.count()
    full = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = full.filter(
        F.col("event_type").isin("click", "purchase")
    ).count()
    assert n == expected


def test_pruned_read_touches_only_selected_directories(
    spark, sf_dir, tmp_path
):
    """File-level ground truth: the files the scan reports are all inside
    the two selected partition directories."""
    out = _write_partitioned(spark, sf_dir, tmp_path)
    df = spark.read.parquet(out).filter(
        F.col("event_type") == "error"
    )
    files = [
        r[0]
        for r in df.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    ]
    assert files, "scan returned no files"
    assert all("event_type=error" in f for f in files), files
