"""Pins for `bpe_apply_merges` (operators/text.py): full BPE encoding
by chained double-separator replaces.

Three layers of evidence:
1. the replace-chain encoding equals a reference Python BPE fold
   symbol-for-symbol on adversarial tokens (overlapping pairs, chained
   merges, singleton/digit tokens);
2. hand-computed per-document accounting on a tiny fixture;
3. structural invariants on the shipped corpus (symbol counts bounded
   by chars, merges never increase token count).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_to_parquet_spark.operators.text import (
    _BPE_MERGES,
    _bpe_encode_expr,
    bpe_apply_merges,
)


def _reference_fold(tok: str) -> list[str]:
    """Sequential BPE apply: one greedy left-to-right pass per merge in
    rank order (the semantics the operator docstring pins)."""
    syms = list(tok)
    for a, b in _BPE_MERGES:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


ADVERSARIAL = [
    "the",          # full chain t,h -> th -> the
    "thin",         # th + in
    "thing",        # th + ing (in,g fires after i,n)
    "and", "ant",   # an,d vs an + bare t
    "inin",         # consecutive occurrences of one merge both fire
    "tition",       # chained: t,i -> ti then ti,on -> tion
    "station",      # st,at,i,on — (t,i) preempted by earlier merges
    "inning",       # in, n, ing — leftmost-greedy picks the FIRST in
    "ererer",       # odd overlap run of a single merge
    "restoration",
    "a", "x9z",     # singleton + digit pass-through
]


def test_replace_chain_matches_reference_fold(spark):
    df = spark.createDataFrame([(w,) for w in ADVERSARIAL], "t string")
    rows = df.select(
        "t", F.expr(_bpe_encode_expr("t", "spark")).alias("e")
    ).collect()
    for r in rows:
        got = [x for x in r["e"].split("|") if x]
        assert got == _reference_fold(r["t"]), r["t"]
        # the count formula the operator uses (no re-parse)
        assert (len(r["e"]) - len(r["t"])) // 2 - 1 == len(got), r["t"]


def test_duckdb_twin_matches_reference_fold():
    import duckdb

    for w in ADVERSARIAL:
        e = duckdb.sql(
            "SELECT " + _bpe_encode_expr(f"'{w}'", "duckdb") + " AS e"
        ).fetchone()[0]
        assert [x for x in e.split("|") if x] == _reference_fold(w), w


@pytest.fixture(scope="module")
def bpe_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("bpedocs")
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the thin thing",      # 1 + 2 + 2 = 5 BPE symbols
                "And ant!",            # lowercased: and=1, ant=2
                "tition x9z",          # 2 + 3
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [14, 8, 10],
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def test_hand_computed_document_accounting(spark, bpe_docs_dir):
    rows = {
        r["doc_id"]: r for r in bpe_apply_merges(spark, bpe_docs_dir).collect()
    }
    # doc 0: tokens the/thin/thing -> 3+4+5=12 chars, 1+2+2=5 symbols
    assert rows[0]["n_word_tokens"] == 3
    assert rows[0]["n_token_chars"] == 12
    assert rows[0]["n_bpe_tokens"] == 5
    assert rows[0]["chars_per_bpe_token"] == 12 / 5
    # doc 1: and/ant -> 6 chars, 1+2=3 symbols (punctuation stripped,
    # uppercase folded by the shared tokenizer)
    assert rows[1]["n_word_tokens"] == 2
    assert rows[1]["n_token_chars"] == 6
    assert rows[1]["n_bpe_tokens"] == 3
    # doc 2: tition -> ti,tion (2); x9z -> x,9,z (3)
    assert rows[2]["n_bpe_tokens"] == 5


def test_encode_decode_roundtrip_corpus(spark, sf_dir):
    """BPE DECODE (r14 VERDICT item 5): the double-separator encoding
    is a verified bijection — stripping the separators inverts the
    encoding back to the original token ('||t||h||e||' -> 'the'; merges
    only ever move pipes, never characters), so detokenization is one
    replace and packing consumers get a corpus-wide integrity check.
    Proved over EVERY corpus token in both engines: zero mismatches."""
    import duckdb

    from data_to_parquet_spark.functions.exprs import exploded_rows, tokens
    from data_to_parquet_spark.operators.base import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = exploded_rows(d, [], tokens(F.col("text")), "t")
    dec = F.expr(
        f"replace({_bpe_encode_expr('t', 'spark')}, '|', '')"
    )
    assert toks.filter(dec != F.col("t")).count() == 0

    n_bad = duckdb.sql(
        f"""
        WITH tok AS (
          SELECT unnest(list_filter(string_split_regex(lower(text),
                 '[^a-z0-9]+'), x -> x <> '')) AS t
          FROM '{sf_dir}/documents.parquet'
        )
        SELECT COUNT(*) FROM tok
        WHERE replace({_bpe_encode_expr("t", "duckdb")}, '|', '') <> t
        """
    ).fetchone()[0]
    assert n_bad == 0


def test_corpus_invariants(spark, sf_dir):
    out = bpe_apply_merges(spark, sf_dir)
    bad = out.filter(
        (F.col("n_bpe_tokens") > F.col("n_token_chars"))
        | (F.col("n_bpe_tokens") < F.col("n_word_tokens"))
        | (F.col("chars_per_bpe_token") < 1.0)
    ).count()
    assert bad == 0
    assert out.count() > 0


@pytest.fixture(scope="module")
def fert_docs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fertdocs")
    # en: the(1) thin(2) / and(1) -> 3 word tokens, 4 BPE symbols
    # xx: qqq(3) www(3)          -> 2 word tokens, 6 BPE symbols
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["the thin", "and", "qqq www"],
            "lang": ["en", "en", "xx"],
            "source": ["s"] * 3,
            "n_chars": [8, 3, 7],
        }
    )
    docs.to_parquet(root / "documents.parquet")
    return str(root)


def test_fertility_hand_computed(spark, fert_docs_dir):
    from data_to_parquet_spark.operators.text import bpe_fertility_by_lang

    rows = {
        r["lang"]: r
        for r in bpe_fertility_by_lang(spark, fert_docs_dir).collect()
    }
    en, xx = rows["en"], rows["xx"]
    # en: the->the(1), thin->th,in(2), and->and(1): 4 symbols / 3 words
    assert (en["n_docs"], en["n_word_tokens"], en["n_bpe_tokens"]) == (2, 3, 4)
    assert en["fertility"] == 4 / 3
    assert en["avg_token_chars"] == (3 + 4 + 3) / 3
    # xx: no merges apply to q/w runs -> fully fragmented, fertility 3.0
    # (the vocabulary-mismatch signal the metric exists to expose)
    assert (xx["n_docs"], xx["n_word_tokens"], xx["n_bpe_tokens"]) == (1, 2, 6)
    assert xx["fertility"] == 3.0


def test_fuzz_500_random_tokens_all_three_engines_agree(spark):
    """Seeded fuzz across the token space the tokenizer can emit
    ([a-z0-9]+, lengths 1..14, alphabet skewed toward merge-table
    letters so merges actually fire): the Spark replace chain, the
    DuckDB twin, and the reference Python fold must agree
    symbol-for-symbol on every token — one batched job per engine."""
    import random

    import duckdb

    rng = random.Random(0xB9E)
    alphabet = "thineorandgsou" + "abcdefghijklmnopqrstuvwxyz0123456789"
    words = sorted(
        {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 14))
            )
            for _ in range(500)
        }
    )

    expected = {w: _reference_fold(w) for w in words}

    got_spark = {
        r["t"]: [x for x in r["e"].split("|") if x]
        for r in spark.createDataFrame([(w,) for w in words], "t string")
        .select("t", F.expr(_bpe_encode_expr("t", "spark")).alias("e"))
        .collect()
    }
    assert got_spark == expected

    rel = duckdb.sql(
        "SELECT t, " + _bpe_encode_expr("t", "duckdb") + " AS e "
        "FROM (SELECT unnest(?) AS t)",
        params=[words],
    ).fetchall()
    got_duck = {t: [x for x in e.split("|") if x] for t, e in rel}
    assert got_duck == expected
