"""Continuous Excel ingestion: a Structured Streaming pipeline that watches a
directory for new workbooks and appends their converted rows to a parquet
dataset — incremental, checkpointed, exactly-once per input file.

The reference converts one file per process invocation
(``src/main.rs:35-68``); at pipeline scale the equivalent operator is "every
workbook that ever lands in this prefix, exactly once". The file-source
checkpoint provides the seen-files ledger; conversion itself reuses
:func:`..sources.excel.read_excel` (one task per new file) inside
``foreachBatch``.

Exactly-once mechanics: ``foreachBatch`` alone is only at-least-once — a
crash between a write and the checkpoint commit replays the epoch. Each
batch therefore writes to an epoch-keyed partition directory
(``output_dir/epoch=<epoch_id>``) with ``mode("overwrite")``: a replayed
epoch re-materializes the same file set into the same directory instead of
appending a second copy. Readers see ``epoch`` as an ordinary discovered
partition column.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.excel import DEFAULT_BATCH_SIZE, read_excel

__all__ = ["stream_excel_to_parquet"]


def stream_excel_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    pattern: str = "*.xlsx",
    sheet_name: str | None = None,
    sheet_index: int | None = None,
    skip_rows: int = 0,
    batch_size: int = DEFAULT_BATCH_SIZE,
    available_now: bool = True,
):
    """Start (and return) the ingestion query. With ``available_now`` the
    query drains currently-unseen files and stops — cron-style incremental
    runs; set it False for a long-lived continuous watcher."""
    # binaryFile + select(path): column pruning drops the content column, so
    # the stream moves file NAMES, not file bytes — conversion reads the
    # bytes inside its own tasks.
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", pattern)
        .load(input_dir)
        .select("path")
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        paths = [
            r["path"].removeprefix("file:") for r in batch_df.collect()
        ]
        if not paths:
            return
        df = read_excel(
            spark,
            sorted(paths),
            sheet_name=sheet_name,
            sheet_index=sheet_index,
            skip_rows=skip_rows,
            batch_size=batch_size,
        )
        # epoch-keyed overwrite: replays of an uncommitted epoch (foreachBatch
        # is at-least-once) land in the same directory with the same content
        df.write.mode("overwrite").option("compression", "zstd").parquet(
            f"{output_dir}/epoch={epoch_id}"
        )

    writer = (
        files.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
