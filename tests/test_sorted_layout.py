"""Pins for the layout-optimized sorted write (`sinks.parquet.to_sorted_parquet`):
the property that matters — each output file covers a disjoint range of the
sort key — is verified against the ACTUAL parquet footer statistics via
DuckDB's parquet_metadata(), i.e. by an independent reader, not by trusting
the writer."""

from __future__ import annotations

import duckdb

from data_to_parquet_spark.sinks.parquet import to_sorted_parquet


def test_sorted_write_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lineitem_by_shipdate")
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    to_sorted_parquet(df, out, ["l_shipdate"], n_files=8)

    con = duckdb.connect()
    meta = con.execute(
        f"""
        SELECT file_name,
               MIN(stats_min_value) AS lo,
               MAX(stats_max_value) AS hi
        FROM parquet_metadata('{out}/*.parquet')
        WHERE path_in_schema = 'l_shipdate'
        GROUP BY file_name
        ORDER BY lo
        """
    ).fetchall()
    con.close()
    assert len(meta) >= 2, "expected multiple range files"
    # every footer must carry real stats
    assert all(lo is not None and hi is not None for _, lo, hi in meta)
    # disjoint (boundary equality allowed: range partitioner splits on a
    # key value, so one date can end file k and start file k+1)
    for (_, _, hi_prev), (_, lo_next, _) in zip(meta, meta[1:]):
        assert hi_prev <= lo_next, (
            f"file ranges overlap: {hi_prev} > {lo_next} — files are not "
            "range-disjoint, min/max skipping is defeated"
        )
    # and the data survives intact
    n_src = df.count()
    n_out = spark.read.parquet(out).count()
    assert n_out == n_src


def test_unsorted_write_ranges_overlap_as_baseline(spark, sf_dir, tmp_path):
    """Negative control: the same table written WITHOUT range layout has
    overlapping per-file ranges (every file spans ~the whole key domain),
    which is exactly the layout `to_sorted_parquet` exists to avoid."""
    out = str(tmp_path / "lineitem_unsorted")
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df.repartition(8).write.mode("overwrite").parquet(out)

    con = duckdb.connect()
    meta = con.execute(
        f"""
        SELECT file_name,
               MIN(stats_min_value) AS lo,
               MAX(stats_max_value) AS hi
        FROM parquet_metadata('{out}/*.parquet')
        WHERE path_in_schema = 'l_shipdate'
        GROUP BY file_name
        ORDER BY lo
        """
    ).fetchall()
    con.close()
    if len(meta) < 2:
        return  # tiny SF collapsed to one file — nothing to compare
    overlaps = sum(
        1
        for (_, _, hi_prev), (_, lo_next, _) in zip(meta, meta[1:])
        if hi_prev > lo_next
    )
    assert overlaps > 0, (
        "round-robin files unexpectedly range-disjoint — the baseline is "
        "not exercising what the sorted layout fixes"
    )
