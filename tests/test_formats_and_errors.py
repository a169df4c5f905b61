"""Source/sink format breadth (CSV/JSON/ORC round-trips) and error-path
robustness for the Excel sources."""

from __future__ import annotations

import zipfile

import pytest

from data_to_parquet_spark import DataToParquetError, read_excel

import __spark_entry__ as entry_mod


def test_csv_json_orc_roundtrips(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    for fmt in ("csv", "json", "orc"):
        out = str(tmp_path / f"nation_{fmt}")
        writer = src.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", True)
        getattr(writer, fmt)(out)
        reader = spark.read
        if fmt == "csv":
            reader = reader.option("header", True).schema(src.schema)
        back = getattr(reader, fmt)(out)
        assert back.count() == 25
        assert set(back.columns) == set(src.columns)


def test_corrupt_zip_raises(spark, tmp_path):
    bad = tmp_path / "bad.xlsx"
    bad.write_bytes(b"this is not a zip file at all")
    with pytest.raises(DataToParquetError, match="cannot open"):
        read_excel(spark, str(bad))


def test_zip_without_workbook_raises(spark, tmp_path):
    path = str(tmp_path / "hollow.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("unrelated.txt", "nothing here")
    with pytest.raises((DataToParquetError, KeyError)):
        read_excel(spark, str(path))


def test_header_only_sheet(spark, tmp_path):
    from .xlsx_fixture import write_xlsx

    path = str(tmp_path / "header_only.xlsx")
    write_xlsx(path, {"S": [["a", "b"]]})
    df = read_excel(spark, path)
    assert df.columns == ["a", "b"]
    assert df.count() == 0


def test_no_duplicate_query_names():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)  # every oracle has a query
    assert len(qs) >= 60


def test_convert_many(spark, tmp_path):
    from .xlsx_fixture import write_xlsx
    from data_to_parquet_spark.api import convert_many

    paths = []
    for i in range(3):
        p = str(tmp_path / f"cm{i}.xlsx")
        write_xlsx(p, {"S": [["k", "v"], [i, i * 2]]})
        paths.append(p)
    out = str(tmp_path / "cm_out")
    n = convert_many(paths, out, spark=spark)
    assert n == 3
    assert spark.read.parquet(out).count() == 3


def test_sql_surface_over_registered_views(spark, sf_dir):
    from data_to_parquet_spark.catalog import register_tables

    register_tables(spark, sf_dir)
    out = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    assert len(out) == 6  # all flag/status combos in this corpus
    joined = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN customer c"
        " ON o.o_custkey = c.c_custkey"
    ).first()["n"]
    assert joined > 0


def test_compact_parquet_small_files(spark, tmp_path):
    from data_to_parquet_spark.sinks.parquet import compact_parquet

    src = str(tmp_path / "small")
    # 64 tiny files (the post-ingestion worst case)
    spark.range(0, 64_000).repartition(64).write.parquet(src)
    import glob as g

    assert len(g.glob(f"{src}/part-*.parquet")) == 64
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_file_bytes=10**9)
    assert n == 1  # everything fits one target-sized file
    assert spark.read.parquet(out).count() == 64_000
    # per-file target smaller than the dataset → several files
    total = sum(
        __import__("os").path.getsize(p) for p in g.glob(f"{src}/part-*.parquet")
    )
    out2 = str(tmp_path / "compacted2")
    n2 = compact_parquet(spark, src, out2, target_file_bytes=max(1, total // 4))
    assert 3 <= n2 <= 5
    assert spark.read.parquet(out2).count() == 64_000
