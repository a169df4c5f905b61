"""Event-time layout matrix: the events fixture has shipped in different
parquet timestamp layouts across testdata generations (TIMESTAMP(NANOS),
then TIMESTAMP_NTZ micros). Batch (`load_table`) and streaming
(`_events_stream`) must normalize every layout to TIMESTAMP — the only type
`withWatermark` accepts — so a silent testdata regeneration breaks this
unit test instead of the driver run."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_to_parquet_spark.operators.base import load_table

_N = 48


def _write_events(path: str, unit: str, tz: str | None) -> None:
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    ts = [base + dt.timedelta(minutes=i, microseconds=i) for i in range(_N)]
    table = pa.table(
        {
            "event_id": pa.array(range(_N), pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([i % 5 for i in range(_N)], pa.int64()),
            "event_type": pa.array(
                ["click" if i % 2 else "view" for i in range(_N)]
            ),
            "value": pa.array([float(i) for i in range(_N)], pa.float64()),
            "props": pa.array(["{}"] * _N),
        }
    )
    # version 2.6 keeps NANOS as NANOS (older versions coerce to micros)
    pq.write_table(table, path, version="2.6")


LAYOUTS = [
    ("nanos_ntz", "ns", None),  # TIMESTAMP(NANOS) — the round-1/2 testdata
    ("micros_ntz", "us", None),  # TIMESTAMP_NTZ — the round-3+ testdata
    ("micros_utc", "us", "UTC"),  # instant-adjusted — plain TIMESTAMP
]


@pytest.fixture(scope="module", params=LAYOUTS, ids=[l[0] for l in LAYOUTS])
def layout_dir(request, tmp_path_factory):
    name, unit, tz = request.param
    d = tmp_path_factory.mktemp(f"events_{name}")
    _write_events(str(d / "events.parquet"), unit, tz)
    return str(d)


def test_batch_load_normalizes_to_timestamp(spark, layout_dir):
    df = load_table(spark, layout_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = df.orderBy("event_id").collect()
    assert len(rows) == _N
    # wall-clock values survive the normalization (session tz is UTC)
    assert rows[1]["ts"] == dt.datetime(2024, 1, 1, 0, 1, 0, 1)


def test_streaming_watermark_runs_on_every_layout(spark, layout_dir):
    """The regression this file exists for: a watermarked streaming agg
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE crash when the source surfaces
    TIMESTAMP_NTZ or nanos-as-long event time)."""
    from data_to_parquet_spark.streaming.windows import (
        streaming_tumbling_5min,
    )

    out = streaming_tumbling_5min(spark, layout_dir)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in out.collect()
    }
    assert sum(got.values()) == _N
    # 48 one-minute-spaced events → ~10 five-minute windows × 2 types
    assert got[("2024-01-01 00:00:00", "view")] == 3
    assert got[("2024-01-01 00:00:00", "click")] == 2
