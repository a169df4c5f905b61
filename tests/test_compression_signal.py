"""Value-check for the oracle-less ``compression_ratio_signal``: compare
the Spark pipeline's output against an INDEPENDENT read of the same parquet
(pyarrow) + direct ``zlib.compress`` — zlib at a pinned level is
bit-deterministic, so the comparison is exact, giving this rows-only query
the same evidence strength as an oracled one."""

from __future__ import annotations

import zlib

import pyarrow.parquet as pq

import __spark_entry__ as entry_mod


def test_compression_signal_matches_direct_zlib(spark, sf_dir):
    df = entry_mod.queries()["compression_ratio_signal"](spark, sf_dir)
    got = {r["doc_id"]: r for r in df.collect()}

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pylist()
    assert len(got) == len(docs)
    for row in docs:
        raw = row["text"].encode("utf-8")
        expect_comp = len(zlib.compress(raw, 6))
        r = got[row["doc_id"]]
        assert r["raw_bytes"] == len(raw)
        assert r["zlib_bytes"] == expect_comp
        assert abs(r["ratio"] - round(expect_comp / len(raw), 9)) < 1e-12
        assert r["is_repetitive"] == (expect_comp / len(raw) < 0.35)
