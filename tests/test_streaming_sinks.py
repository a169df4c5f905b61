"""Streaming sink patterns: foreachBatch idempotent (exactly-once-style)
parquet writes — the production sink shape for non-transactional targets."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_foreach_batch_idempotent_parquet_sink(spark, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    source = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    if dict(source.dtypes).get("ts") == "bigint":
        source = source.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    agg = source.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def write_epoch(batch_df, epoch_id: int) -> None:
        # idempotent: one deterministic directory per epoch; re-running the
        # epoch overwrites the same path instead of duplicating rows
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out, f"epoch={epoch_id}")
        )

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    written = spark.read.parquet(os.path.join(out, "epoch=0"))
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy("event_type")
        .count()
    )
    got = {r["event_type"]: r["n"] for r in written.collect()}
    want = {r["event_type"]: r["count"] for r in batch.collect()}
    assert got == want


def test_incremental_excel_ingestion(spark, tmp_path):
    """New workbooks are converted exactly once across restarts."""
    from data_to_parquet_spark.streaming.ingest import stream_excel_to_parquet

    from .xlsx_fixture import write_xlsx

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = str(tmp_path / "dataset")
    ckpt = str(tmp_path / "ckpt2")

    write_xlsx(str(inbox / "a.xlsx"), {"S": [["k", "v"], [1, "a"]]})
    write_xlsx(str(inbox / "b.xlsx"), {"S": [["k", "v"], [2, "b"]]})
    q = stream_excel_to_parquet(spark, str(inbox), out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 2

    # second run with one NEW file: only the new file is ingested
    write_xlsx(str(inbox / "c.xlsx"), {"S": [["k", "v"], [3, "c"]]})
    q = stream_excel_to_parquet(spark, str(inbox), out, ckpt)
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert sorted(r["k"] for r in back.collect()) == ["1", "2", "3"]


def test_ingestion_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a crash between the parquet
    write and the checkpoint commit by deleting the commit record, forcing
    the engine to replay the epoch on restart — the epoch-keyed overwrite
    must leave the dataset unchanged, not append a second copy."""
    import os as _os

    from data_to_parquet_spark.streaming.ingest import stream_excel_to_parquet

    from .xlsx_fixture import write_xlsx

    inbox = tmp_path / "inbox_r"
    inbox.mkdir()
    out = str(tmp_path / "dataset_r")
    ckpt = str(tmp_path / "ckpt_r")

    write_xlsx(str(inbox / "a.xlsx"), {"S": [["k", "v"], [1, "a"]]})
    write_xlsx(str(inbox / "b.xlsx"), {"S": [["k", "v"], [2, "b"]]})
    q = stream_excel_to_parquet(spark, str(inbox), out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 2

    # wind back the commit log only: offsets stay, so restart re-executes
    # epoch 0 with the same file set (exactly the partial-write crash case).
    # Restart from a COPY of the checkpoint — Spark caches commit-log state
    # per checkpoint path in the JVM and treats in-place edits as a second
    # concurrent query.
    import shutil as _shutil

    ckpt2 = str(tmp_path / "ckpt_r_replay")
    _shutil.copytree(ckpt, ckpt2)
    _os.remove(_os.path.join(ckpt2, "commits", "0"))
    _os.remove(_os.path.join(ckpt2, "commits", ".0.crc"))  # hadoop checksum
    q = stream_excel_to_parquet(spark, str(inbox), out, ckpt2)
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert sorted(r["k"] for r in back.collect()) == ["1", "2"]


def test_watermark_drops_late_data(spark, tmp_path):
    """Event-time watermark semantics: rows later than the watermark bound
    are dropped from append-mode windowed aggregation."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "wm_ckpt")

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"tmp_{name}")
        )
        import glob as g
        import shutil

        part = g.glob(str(tmp_path / f"tmp_{name}" / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    # batch 1: events up to 12:00 → watermark advances to 11:50
    write_batch(
        "b1",
        [
            ("2024-01-01 10:00:30", "a", 1.0),
            ("2024-01-01 12:00:00", "a", 2.0),
        ],
    )
    schema = "ts timestamp, k string, v double"
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = "wm_out"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 2: an hours-late event (10:05, watermark ~11:50) → dropped
    write_batch("b2", [("2024-01-01 10:05:00", "a", 99.0)])
    # and a fresh event to push processing forward and finalize windows
    write_batch("b3", [("2024-01-01 13:00:00", "a", 3.0)])
    q.processAllAvailable()
    q.stop()

    rows = {
        (r["window"]["start"].strftime("%H:%M"), r["n"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    # the 10:00 window finalized with ONE row — the late 10:05 event was
    # dropped, not merged
    assert ("10:00", 1) in rows
    assert ("10:05", 1) not in rows and ("10:00", 2) not in rows


def test_tws_registration_matches_protobuf_availability():
    """transformWithStateInPandas needs protobuf (its state protocol);
    the query must be registered exactly when the dependency imports, so
    environments without it (this container) never expose a query that
    crashes on first contact."""
    from data_to_parquet_spark.streaming import windows as w

    try:
        import google.protobuf  # noqa: F401

        available = True
    except ImportError:
        available = False
    assert w._tws_available() is available
    assert (
        "streaming_tws_user_stats" in w.STREAMING.queries()
    ) is available
    # the implementation itself must stay importable either way
    assert callable(w.streaming_tws_user_stats)
