"""Boundary-size shingle rules for the minhash family.

The production variant (`partial_shingles`, used by `_minhash_signatures` /
`dedup_minhash_pairs`) keeps ONE partial shingle for 1..w-1-token documents
so short docs still participate in near-dup detection; zero-token docs emit
nothing (otherwise every empty doc would collide at est_jaccard 1.0). The
md5-oracled twin (`strict_shingles`, used by `dedup_minhash_md5_pairs` and
mirrored by its DuckDB oracle's generate_series) deliberately drops sub-w
docs instead. These rules were previously implicit in two inline exprs
whose boundary behavior silently differed while the twin's docstring
claimed they matched — this pins each rule, and their agreement above the
boundary, at the sizes where they diverge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_to_parquet_spark.operators.dedup import (
    _SHINGLE_W,
    _minhash_signatures,
    partial_shingles,
    strict_shingles,
)


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            (0, []),
            (1, ["a"]),
            (2, ["a", "b"]),
            (3, ["a", "b", "c"]),
            (4, ["a", "b", "c", "d"]),
            (5, ["a", "a", "a", "a"]),  # duplicate windows
        ],
        "doc_id long, t array<string>",
    )


def _rule(df, col):
    return {
        r["doc_id"]: list(r["s"])
        for r in df.select("doc_id", col.alias("s")).collect()
    }


def test_partial_rule_boundaries(toy):
    got = _rule(toy, partial_shingles("t"))
    assert got[0] == []  # zero tokens -> nothing
    assert got[1] == ["a"]  # 1 token -> one partial shingle
    assert got[2] == ["a b"]  # 2 tokens -> one partial shingle
    assert got[3] == ["a b c"]
    assert got[4] == ["a b c", "b c d"]


def test_strict_rule_boundaries(toy):
    got = _rule(toy, strict_shingles("t"))
    assert got[0] == []
    assert got[1] == []  # strict: sub-w docs emit NOTHING
    assert got[2] == []
    assert got[3] == ["a b c"]
    assert got[4] == ["a b c", "b c d"]


def test_rules_agree_at_and_above_window_width(toy):
    """Above the boundary the two rules differ only by array_distinct."""
    both = toy.filter(F.size("t") >= _SHINGLE_W).select(
        "doc_id",
        partial_shingles("t").alias("p"),
        strict_shingles("t").alias("s"),
    )
    for r in both.collect():
        assert sorted(set(r["p"])) == sorted(r["s"]), r["doc_id"]


def test_signature_table_membership_matches_partial_rule(spark, toy):
    """_minhash_signatures keeps 1-2-token docs (their partial shingle
    hashes like any other) and drops zero-token docs entirely."""
    docs = toy.select("doc_id", F.col("t").alias("tokens"))
    sig = _minhash_signatures(docs)
    present = {r["doc_id"] for r in sig.select("doc_id").collect()}
    assert present == {1, 2, 3, 4, 5}
    # identical single-token docs must produce identical signatures
    rows = {r["doc_id"]: tuple(r["sig"]) for r in sig.collect()}
    assert len(rows[1]) > 0 and len(rows[3]) > 0
