"""Replicates the driver's correctness gate locally: for every query in
``__spark_entry__.queries()`` that has an ``oracle_sql()`` entry, run the
Spark build and the DuckDB SQL on the same parquet tables and compare
row count, column names, and exact values (sorted rows) — stricter than the
driver's hash, so passing here implies passing there.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(t):
    return tuple((1, 0) if v is None else (0, v) for v in t)


def _spark_rows(df, cols):
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()),
        key=_sort_key,
    )


def _duck_rows(res, cols, names):
    idx = [names.index(c) for c in cols]
    return sorted(
        (tuple(_norm(row[i]) for i in idx) for row in res),
        key=_sort_key,
    )


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sorted(sdf.columns)

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_names = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    d_pdf = con.execute(ORACLES[name]).df()
    con.close()

    assert spark_cols == sorted(duck_names), (
        f"{name}: column mismatch spark={spark_cols} duck={sorted(duck_names)}"
    )
    # Rendered-pandas dtype check, mirroring the driver's stringify-hash:
    # `900` (int64) and `900.0` (float64) are == in Python but hash
    # differently once each side is converted to pandas and stringified.
    # Integer widths and datetime units render identically, so compare
    # dtype families; float32 vs float64 DOES render differently (repr
    # precision) and stays a mismatch.
    def _family(dt: str) -> str:
        if dt.lstrip("u").lstrip("U").lower().startswith("int"):
            return "int"
        if dt.startswith("datetime64"):
            return "datetime"
        return dt

    s_pdf = sdf.toPandas()
    dtype_mismatch = {
        c: (str(s_pdf[c].dtype), str(d_pdf[c].dtype))
        for c in spark_cols
        if _family(str(s_pdf[c].dtype)) != _family(str(d_pdf[c].dtype))
    }
    assert not dtype_mismatch, (
        f"{name}: pandas dtype mismatch (spark, duck): {dtype_mismatch}"
    )
    s_rows = _spark_rows(sdf, spark_cols)
    d_rows = _duck_rows(duck_rows, spark_cols, duck_names)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


def _nested_columns(schema):
    """Columns whose type the driver's canonicalizer cannot sort/hash.

    The driver canonicalizes oracled results with pandas ``sort_values``,
    which raises ``TypeError: unhashable type`` on list/dict cells
    (round-4 red mark: ``pii_extract_spans``). This harness used to mask
    that by tuple-izing list cells in ``_norm`` — so "passing here implies
    passing there" was false for nested outputs. The lint below restores
    that guarantee: every oracled query must have a flat output schema.
    """
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracled_schema_is_flat(name, spark, sf_dir):
    schema = QUERIES[name](spark, sf_dir).schema
    nested = _nested_columns(schema)
    assert not nested, (
        f"{name}: oracled query emits nested columns {nested}; the driver's "
        "canonicalizer crashes on array/map/struct cells — serialize them "
        "(e.g. F.array_join(F.array_sort(...), ',')) on both engines"
    )


def test_flat_schema_lint_catches_arrays(spark):
    """The lint itself must flag nested outputs (regression test for the
    round-4 gap where an arrayed query passed locally but crashed the
    driver)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.col("id"),
        F.array(F.lit("a"), F.lit("b")).alias("arr"),
        F.create_map(F.lit("k"), F.lit("v")).alias("m"),
        F.struct(F.lit(1).alias("x")).alias("s"),
    )
    assert _nested_columns(df.schema) == ["arr", "m", "s"]


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
