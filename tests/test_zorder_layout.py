"""Pins for Z-order clustering (`functions.zorder` + `to_zordered_parquet`).

Three layers:
1. the Morton interleave and the exact-integer scaling (Spark expression vs
   a pure-Python reference, exhaustive on the low domain + randomized; the
   DuckDB SQL formulation against the same reference);
2. the layout property that matters, verified via parquet FOOTER stats read
   by an independent reader (DuckDB parquet_metadata): z-ordered files
   bound BOTH dimensions, while a single-column sort leaves the other
   dimension's per-file span at ~the full domain;
3. two-dimensional skipping: a small (custkey, day) rectangle query needs
   fewer z-ordered files than date-sorted files.

Negative control inside test 2: interleaving WITHOUT equal-width scaling
degenerates (the wider dimension owns every high z-bit), which is why
`scale_to_bits` exists.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from data_to_parquet_spark.functions.zorder import (
    scale_to_bits,
    zorder_key,
    zorder_key_sql,
)
from data_to_parquet_spark.sinks.parquet import (
    to_sorted_parquet,
    to_zordered_parquet,
)

BITS = 12


def _morton_py(x: int, y: int, bits: int = BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference_bits(spark):
    rng = random.Random(7)
    pts = [(x, y) for x in range(8) for y in range(8)]
    pts += [(rng.randrange(4096), rng.randrange(4096)) for _ in range(200)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), BITS).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_py(x, y), (x, y)


def test_sql_interleave_matches_python(spark):
    # the oracle-side arithmetic formulation is the same function
    con = duckdb.connect()
    expr = zorder_key_sql("x", "y", BITS)
    rows = con.execute(
        f"SELECT x, y, {expr} AS z FROM (SELECT unnest(range(0, 64)) % 8"
        " AS x, unnest(range(0, 64)) // 8 AS y)"
    ).fetchall()
    con.close()
    for x, y, z in rows:
        assert z == _morton_py(x, y)


def test_scale_to_bits_is_exact_integer_division(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(10**9), rng.randrange(1, 10**9)) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "v long, vmax long").select(
        "v",
        "vmax",
        scale_to_bits(F.col("v"), F.col("vmax"), BITS).alias("s"),
    )
    for r in df.collect():
        assert r["s"] == (r["v"] * (1 << BITS)) // (r["vmax"] + 1)


def _file_spans(out: str, col: str):
    """Per-file (lo, hi) min/max for one column, from footer stats."""
    con = duckdb.connect()
    meta = con.execute(
        f"""
        SELECT file_name,
               MIN(CAST(stats_min_value AS BIGINT)) AS lo,
               MAX(CAST(stats_max_value AS BIGINT)) AS hi
        FROM parquet_metadata('{out}/*.parquet')
        WHERE path_in_schema = '{col}'
        GROUP BY file_name
        """
    ).fetchall()
    con.close()
    return {f: (lo, hi) for f, lo, hi in meta}


def _orders_cells(spark, sf_dir):
    """(x, y) raw dims plus equal-width 12-bit scaled cells."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dims = o.select(
        F.col("o_custkey").cast("long").alias("x"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).cast("long").alias("y"),
    )
    dom = dims.agg(F.max("x").alias("xmax"), F.max("y").alias("ymax"))
    return dims.join(F.broadcast(dom)).select(
        "x",
        "y",
        scale_to_bits(F.col("x"), F.col("xmax"), BITS).alias("xs"),
        scale_to_bits(F.col("y"), F.col("ymax"), BITS).alias("ys"),
    )


def _avg_span(spans):
    vals = [hi - lo for lo, hi in spans.values()]
    return sum(vals) / len(vals)


def test_zorder_bounds_both_dimensions(spark, sf_dir, tmp_path):
    cells = _orders_cells(spark, sf_dir)
    x_dom = cells.agg(F.max("x") - F.min("x")).collect()[0][0]
    y_dom = cells.agg(F.max("y") - F.min("y")).collect()[0][0]

    z_out = str(tmp_path / "orders_z")
    to_zordered_parquet(
        cells,
        z_out,
        zorder_key(F.col("xs"), F.col("ys"), BITS),
        n_files=16,
    )
    sorted_out = str(tmp_path / "orders_by_y")
    to_sorted_parquet(cells, sorted_out, ["y"], n_files=16)
    # negative control: interleave the RAW dims (unequal bit widths) —
    # the wider dimension owns the high z-bits
    raw_out = str(tmp_path / "orders_z_raw")
    to_zordered_parquet(
        cells,
        raw_out,
        zorder_key(F.col("x"), F.col("y"), 16),
        n_files=16,
    )

    zx, zy = _file_spans(z_out, "x"), _file_spans(z_out, "y")
    sx = _file_spans(sorted_out, "x")
    rx = _file_spans(raw_out, "x")
    if len(zx) < 8 or len(sx) < 8:
        return  # degenerate file counts — nothing meaningful to compare

    # z-order: BOTH dims' average per-file span is a strict subset of the
    # domain (each file is a rectangle, not a slab) ...
    assert _avg_span(zx) < 0.6 * x_dom, (_avg_span(zx), x_dom)
    assert _avg_span(zy) < 0.6 * y_dom, (_avg_span(zy), y_dom)
    # ... while the y-sorted layout leaves x unconstrained per file
    assert _avg_span(sx) > 0.9 * x_dom, (_avg_span(sx), x_dom)
    # ... and so does unscaled interleaving when y is the wider dim
    # (x at sf0.001 spans ~8 bits vs y's ~12: every range split lands on
    # a y bit). This is the failure scale_to_bits exists to prevent.
    assert _avg_span(rx) > 0.75 * _avg_span(sx), (_avg_span(rx), _avg_span(sx))


def test_zorder_prunes_rectangle_queries(spark, sf_dir, tmp_path):
    # needs enough rows that 32 files' min/max stats reflect the layout
    # rather than sampling noise (sf0.001 has ~1.5k orders = ~47 rows/file)
    import os

    bigger = "/root/testdata/sf0.01"
    if os.path.exists(f"{bigger}/orders.parquet"):
        sf_dir = bigger
    cells = _orders_cells(spark, sf_dir)
    z_out = str(tmp_path / "orders_z2")
    to_zordered_parquet(
        cells,
        z_out,
        zorder_key(F.col("xs"), F.col("ys"), BITS),
        n_files=32,
    )
    sorted_out = str(tmp_path / "orders_by_y2")
    to_sorted_parquet(cells, sorted_out, ["y"], n_files=32)

    zx, zy = _file_spans(z_out, "x"), _file_spans(z_out, "y")
    sx, sy = _file_spans(sorted_out, "x"), _file_spans(sorted_out, "y")
    if len(zx) < 16 or len(sx) < 16:
        return

    x_max = max(hi for _, hi in zx.values())
    y_max = max(hi for _, hi in zy.values())
    # a sixteenth-of-each-axis rectangle, placed off the quad boundary
    # (5/16 .. 6/16) — a point query's neighborhood, the zone-map case
    qx = (x_max * 5 // 16, x_max * 6 // 16)
    qy = (y_max * 5 // 16, y_max * 6 // 16)

    def files_touched(x_spans, y_spans):
        return sum(
            1
            for f in x_spans
            if not (
                x_spans[f][1] < qx[0]
                or x_spans[f][0] > qx[1]
                or y_spans[f][1] < qy[0]
                or y_spans[f][0] > qy[1]
            )
        )

    n_z = files_touched(zx, zy)
    n_sorted = files_touched(sx, sy)
    # the z layout must let zone maps skip files the 1-D layout cannot
    assert n_z < n_sorted, (n_z, n_sorted)
