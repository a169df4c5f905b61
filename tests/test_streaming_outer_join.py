"""Semantics pin for the LEFT OUTER stream-stream interval join (rows-only
in the driver contract): the inner portion must equal the batch interval
join exactly, and null-extended rows must be exactly the unmatched clicks —
all of them once their join window closed below the final watermark, none
of them otherwise."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_to_parquet_spark.operators.base import load_table
from data_to_parquet_spark.streaming.windows import (
    streaming_stream_stream_left_outer,
)


def test_outer_join_matches_batch_semantics(spark, sf_dir):
    out = streaming_stream_stream_left_outer(spark, sf_dir).collect()
    got_inner = sorted(
        (r["user_id"], r["click_id"], r["purchase_id"], r["secs_to_purchase"])
        for r in out
        if r["purchase_id"] is not None
    )
    got_null_clicks = sorted(
        r["click_id"] for r in out if r["purchase_id"] is None
    )
    assert len(got_null_clicks) == len(set(got_null_clicks))

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).collect()
    exp_inner = sorted(
        (
            r["c_user"],
            r["click_id"],
            r["purchase_id"],
            int((r["p_ts"].replace(tzinfo=None) - r["c_ts"].replace(tzinfo=None)).total_seconds()),
        )
        for r in batch
        if r["purchase_id"] is not None
    )
    # 1. the inner portion is exactly the batch interval join
    assert got_inner == exp_inner

    unmatched = {
        r["click_id"]: r["c_ts"] for r in batch if r["purchase_id"] is None
    }
    # 2. every null-extended row is a genuinely unmatched click
    assert set(got_null_clicks) <= set(unmatched)
    # 3. and every unmatched click whose join window closed safely below
    # the final watermark was emitted — the watermark cutoff is the ONLY
    # legitimate reason to withhold an unmatched click. The query
    # watermark is the MIN across both inputs (each max ts - 10 min
    # delay); a left row is evicted (and its null row emitted) once
    # c_ts + 10 min (the join window bound) drops below it. 1 s margin.
    maxes = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    )
    wm = min(r["m"] for r in maxes).replace(tzinfo=None) - dt.timedelta(
        minutes=10
    )
    cutoff = wm - dt.timedelta(minutes=10, seconds=1)
    must_emit = {
        cid
        for cid, cts in unmatched.items()
        if cts.replace(tzinfo=None) < cutoff
    }
    assert must_emit <= set(got_null_clicks)
    assert len(must_emit) > 0  # the fixture actually exercises emission
