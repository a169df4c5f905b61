"""Parquet sink (reference O12: ZSTD single-file writer, ``src/lib.rs:279-286``).

Two modes:

* :func:`to_parquet` — the scale path: a normal distributed
  ``df.write.parquet`` directory with ZSTD compression. This is what runs on a
  cluster over 100 TB.
* :func:`to_single_parquet_file` — reference-UX parity: exactly one
  ``.parquet`` file at the given path (the reference's ArrowWriter produces a
  single file). Implemented as a coalesce(1) write to a temp dir + rename;
  only for driver-scale outputs, never for large data.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

from ..errors import DataToParquetError

__all__ = [
    "to_parquet",
    "to_single_parquet_file",
    "compact_parquet",
    "to_sorted_parquet",
]


def to_parquet(
    df: DataFrame,
    path: str,
    *,
    compression: str = "zstd",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        # analog of the reference's row-group sizing knob (src/lib.rs:281-282)
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def to_single_parquet_file(
    df: DataFrame,
    path: str,
    *,
    compression: str = "zstd",
    row_group_rows: int | None = None,
) -> None:
    """Write exactly one Parquet file at ``path`` (reference single-file UX).

    The computation writes with FULL task parallelism to a scratch dir;
    the driver then merges the ordered part files into one file with
    pyarrow. The former coalesce(1) form drained the whole dataset through
    a single task — the merge instead costs one local read+write of the
    already-compressed driver-scale output (measured 2.3 s -> 1.4 s for
    the 100k-row bench conversion). Part files sort by name = partition
    index, and rows within a part keep task order, so global row order is
    exactly the coalesce(1) order (O11 ordered merge, pinned by
    test_single_file_order_preservation / test_split_path_order_*).

    ``row_group_rows`` replicates the reference writer's
    ``max_row_group_size = batch_size`` (``src/lib.rs:281-282``): every
    row group in the merged file holds exactly that many rows (the final
    one partial), regardless of how rows were split across part files.
    ``None`` keeps whatever groups the part writers produced (merge
    concatenates them unchanged).
    """
    if row_group_rows is not None and row_group_rows < 1:
        # api.convert forwards caller batch_size unvalidated; 0 would spin
        # the re-group loop forever on zero-row slices (ADVICE r7)
        raise DataToParquetError(
            f"row_group_rows must be >= 1, got {row_group_rows}"
        )
    tmp = tempfile.mkdtemp(prefix="d2p_", dir=os.path.dirname(path) or ".")
    try:
        out_dir = os.path.join(tmp, "out")
        (
            df.write.mode("overwrite")
            .option("compression", compression)
            .parquet(out_dir)
        )
        parts = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
        if not parts:
            # degenerate: zero tasks ran (empty 0-partition plan) — fall
            # back to a guaranteed-one-part write
            (
                df.coalesce(1)
                .write.mode("overwrite")
                .option("compression", compression)
                .parquet(out_dir)
            )
            parts = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
        if not parts:
            raise DataToParquetError(f"no part files produced in {out_dir}")
        if os.path.exists(path):
            os.remove(path)
        if len(parts) == 1 and row_group_rows is None:
            shutil.move(parts[0], path)
        else:
            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = pq.ParquetFile(parts[0]).schema_arrow
            with pq.ParquetWriter(path, schema, compression=compression) as w:
                if row_group_rows is None:
                    for p in parts:
                        t = pq.read_table(p)
                        if t.num_rows:
                            w.write_table(t)
                else:
                    # re-group across part boundaries: emit groups of
                    # exactly ``row_group_rows`` rows (slices are
                    # zero-copy; memory stays one part + one group)
                    buf: pa.Table | None = None
                    for p in parts:
                        t = pq.read_table(p)
                        if not t.num_rows:
                            continue
                        buf = t if buf is None else pa.concat_tables([buf, t])
                        while buf.num_rows >= row_group_rows:
                            w.write_table(
                                buf.slice(0, row_group_rows),
                                row_group_size=row_group_rows,
                            )
                            buf = buf.slice(row_group_rows)
                    if buf is not None and buf.num_rows:
                        w.write_table(buf, row_group_size=row_group_rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def to_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    n_files: int | None = None,
    compression: str = "zstd",
) -> None:
    """Layout-optimized write: range-partition on ``sort_cols`` then sort
    within each partition before writing.

    Every output file then covers a DISJOINT range of the sort key, so the
    parquet min/max statistics become tight and any engine (Spark's
    parquet filter pushdown, DuckDB zone-map skipping, Trino, ...) prunes
    whole files/row-groups on range predicates over those columns. This is
    the single highest-leverage storage decision for a 100 TB table that
    is predominantly filtered on one dimension (event time, ship date):
    the scan cost of `WHERE d BETWEEN x AND y` drops from O(table) to
    O(selected range). Verified against actual parquet footer metadata in
    tests/test_sorted_layout.py.

    ``repartitionByRange`` samples the key distribution, so file ranges
    are balanced by ROW COUNT (not naive key arithmetic) — skew in the
    sort key produces more files for hot ranges, which is exactly what a
    scan-pruning layout wants.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> int:
    """Compact a parquet dataset's small files into ~``target_file_bytes``
    outputs; returns the number of files written.

    The small-files problem is the canonical failure mode of long-running
    ingestion at scale (each micro-batch/task leaves a file; a year of
    5-minute triggers is ~10⁵ files per partition, and open/seek overhead
    starts to dominate scans). Compaction = read → repartition to
    ceil(bytes/target) → rewrite. The file count is computed from the
    dataset's actual on-disk bytes (compressed), so the output chunking
    tracks data volume, not row counts.
    """
    sizes = [
        os.path.getsize(p)
        for p in glob.glob(os.path.join(in_path, "**", "*.parquet"), recursive=True)
    ]
    if not sizes:
        raise DataToParquetError(f"no parquet files under {in_path!r}")
    n_out = max(1, -(-sum(sizes) // target_file_bytes))  # ceil division
    df = spark.read.parquet(in_path)
    (
        df.repartition(n_out)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(out_path)
    )
    return len(glob.glob(os.path.join(out_path, "part-*.parquet")))


def to_zordered_parquet(
    df: DataFrame,
    path: str,
    zcol,
    *,
    n_files: int | None = None,
    compression: str = "zstd",
) -> None:
    """Two-dimensional layout-optimized write: range-partition + sort on a
    Morton code (``functions.zorder.zorder_key_16``) so every output file
    covers a small RECTANGLE of the two interleaved dimensions.

    ``to_sorted_parquet`` makes one dimension's zone maps tight at the
    price of the other's (a file sorted by date spans all customers);
    z-ordering splits the budget: after k doubling levels both dimensions'
    per-file spans shrink ~2^(k/2)×. The z column itself is written too
    (it is the layout's index key; droppable by readers). Verified against
    parquet footer min/max in tests/test_zorder_layout.py.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    tagged = df.withColumn("_z", zcol)
    (
        tagged.repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )
