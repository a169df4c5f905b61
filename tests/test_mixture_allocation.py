"""Pins for the round-13 batch additions:

- `mixture_token_allocation` (operators/pipeline.py): Hamilton
  apportionment of a fixed token budget across sources — hand-computed
  allocations on a tiny fixture, exact budget conservation on the
  shipped corpus, and the all-int64 surface.
- `doc_repetition_metrics` (operators/text.py): duplicate-token fraction
  and top-bigram mass — hand-computed values on crafted documents,
  including the sub-2-token exclusion.
"""

from __future__ import annotations

import pandas as pd
import pytest

from data_to_parquet_spark.operators.pipeline import (
    _MIX_BUDGET,
    mixture_token_allocation,
)
from data_to_parquet_spark.operators.text import doc_repetition_metrics


@pytest.fixture(scope="module")
def mix_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mixdocs")
    # three sources with 7 / 5 / 3 tokens => budget*n/N leaves remainders
    # that exercise the largest-remainder bonus and its tie-break
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b c d e f g",  # s_a: 7 tokens
                "h i j k l",  # s_b: 5 tokens
                "m n o",  # s_c: 3 tokens
            ],
            "lang": ["en"] * 3,
            "source": ["s_a", "s_b", "s_c"],
            "n_chars": [13, 9, 5],
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def test_hamilton_allocation_hand_computed(spark, mix_docs_dir):
    # N = 15; B = 1_000_000
    # s_a: B*7/15 = 466666 rem 10; s_b: B*5/15 = 333333 rem 5;
    # s_c: B*3/15 = 200000 rem 0. Sum of floors = 999999 -> k = 1,
    # the single bonus goes to the largest remainder (s_a).
    rows = {
        r["source"]: r
        for r in mixture_token_allocation(spark, mix_docs_dir).collect()
    }
    assert rows["s_a"]["base_alloc"] == 466666
    assert rows["s_b"]["base_alloc"] == 333333
    assert rows["s_c"]["base_alloc"] == 200000
    assert (rows["s_a"]["bonus"], rows["s_b"]["bonus"], rows["s_c"]["bonus"]) == (1, 0, 0)
    assert rows["s_a"]["alloc_tokens"] == 466667
    assert sum(r["alloc_tokens"] for r in rows.values()) == _MIX_BUDGET


def test_allocation_conserves_budget_on_shipped_corpus(spark, sf_dir):
    out = mixture_token_allocation(spark, sf_dir).collect()
    assert sum(r["alloc_tokens"] for r in out) == _MIX_BUDGET
    # every bonus is 0/1 and base allocations never exceed the exact share
    assert all(r["bonus"] in (0, 1) for r in out)
    total = sum(r["n_tokens"] for r in out)
    for r in out:
        assert r["base_alloc"] == (_MIX_BUDGET * r["n_tokens"]) // total


@pytest.fixture(scope="module")
def rep_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("repdocs")
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a a a b",  # dup-heavy: bigrams (a a)x2, (a b)
                "u v w x",  # all distinct: every bigram unique
                "solo",  # 1 token -> excluded (no bigram exists)
            ],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
            "n_chars": [7, 7, 4],
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def test_repetition_metrics_hand_computed(spark, rep_docs_dir):
    rows = {
        r["doc_id"]: r
        for r in doc_repetition_metrics(spark, rep_docs_dir).collect()
    }
    assert set(rows) == {0, 1}  # the 1-token doc is excluded
    r0 = rows[0]
    assert r0["n_tokens"] == 4 and r0["n_distinct_tokens"] == 2
    assert r0["dup_token_frac"] == 0.5
    assert r0["n_bigrams"] == 3 and r0["top_bigram_count"] == 2
    assert r0["top_bigram_mass"] == 2.0 / 3.0
    r1 = rows[1]
    assert r1["dup_token_frac"] == 0.0
    assert r1["top_bigram_count"] == 1
    assert r1["top_bigram_mass"] == 1.0 / 3.0


@pytest.fixture(scope="module")
def tie_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiedocs")
    # three sources with 1 token each: B*1/3 = 333333 rem 1 for ALL of
    # them, k = 1 -> exactly one bonus, broken lexicographically
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["x", "y", "z"],
            "lang": ["en"] * 3,
            "source": ["s_b", "s_a", "s_c"],  # arrival order != lex order
            "n_chars": [1, 1, 1],
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def test_remainder_tie_breaks_to_lexicographically_smaller_source(
    spark, tie_docs_dir
):
    rows = {
        r["source"]: r
        for r in mixture_token_allocation(spark, tie_docs_dir).collect()
    }
    assert all(r["base_alloc"] == 333333 for r in rows.values())
    assert (
        rows["s_a"]["bonus"],
        rows["s_b"]["bonus"],
        rows["s_c"]["bonus"],
    ) == (1, 0, 0)
    assert sum(r["alloc_tokens"] for r in rows.values()) == _MIX_BUDGET


@pytest.fixture(scope="module")
def single_source_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("onesource")
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b c", "d e"],
            "lang": ["en"] * 2,
            "source": ["only"] * 2,
            "n_chars": [5, 3],
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def test_single_source_takes_whole_budget_without_bonus(
    spark, single_source_dir
):
    rows = mixture_token_allocation(spark, single_source_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # B*n/n = B exactly: zero remainder, zero bonus, full budget
    assert r["base_alloc"] == _MIX_BUDGET
    assert r["bonus"] == 0
    assert r["alloc_tokens"] == _MIX_BUDGET


def test_overflow_guard_raises_loudly(spark):
    """r13 ADVICE: past ~9.2e12 tokens per source the Spark-side
    budget*n_tokens product would wrap int64 while DuckDB promotes to
    HUGEINT — a silent cross-engine divergence. `_mix_guarded_tokens`
    must turn that into a loud error instead, and pass clean inputs
    through unchanged."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from data_to_parquet_spark.operators.pipeline import (
        _MIX_TOKEN_CEILING,
        _mix_guarded_tokens,
    )

    ok = spark.createDataFrame(
        [("s", 1, _MIX_TOKEN_CEILING)], "source string, n_docs long, n_tokens long"
    )
    assert _mix_guarded_tokens(ok).collect()[0]["n_tokens"] == _MIX_TOKEN_CEILING

    bad = spark.createDataFrame(
        [("s", 1, _MIX_TOKEN_CEILING + 1)],
        "source string, n_docs long, n_tokens long",
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as exc:
        _mix_guarded_tokens(bad).collect()
    assert "int64-safe ceiling" in str(exc.value)


def test_overflow_guard_passes_null_tokens_through(spark):
    """r14 ADVICE: a source whose texts are all NULL aggregates to a
    NULL n_tokens; `x <= ceiling` is NULL for NULL x and assert_true
    used to raise on it with the misleading overflow message. The
    coalesce'd guard must instead pass the row through with n_tokens
    NULL — the same answer DuckDB gives."""
    from data_to_parquet_spark.operators.pipeline import _mix_guarded_tokens

    nul = spark.createDataFrame(
        [("s_null", 2, None)], "source string, n_docs long, n_tokens long"
    )
    row = _mix_guarded_tokens(nul).collect()[0]
    assert row["n_tokens"] is None and row["n_docs"] == 2
