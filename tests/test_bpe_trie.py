"""Pins for the production-scale BPE path (functions/bpe.py, r14
VERDICT item 3): the priority-merge (trie-style) Pandas-UDF encoder
must equal the pinned sequential-fold semantics — on the 16-merge
literal table against the codegen replace chain, and on a TRAINED
~1k-merge table against the reference fold — plus trainer semantics
and the same-slot DataFrame equality.

Layers:
1. trainer: hand-computed merges on a tiny corpus, creation-order
   invariant on the big trained table;
2. encoder: priority-merge == sequential fold on `_BPE_MERGES`
   adversarial tokens AND on the ~1k-merge trained table (seeded fuzz);
3. the same-slot swap: `bpe_apply_merges_udf` row-for-row equal to
   `bpe_apply_merges` on the shipped corpus;
4. the driver-facing audit: `bpe_trie_encoder_agreement` reports
   perfect agreement on the shipped corpus.
"""

from __future__ import annotations

import random

import pytest

from data_to_parquet_spark.functions.bpe import (
    bpe_apply_merges_udf,
    encode_token,
    encode_unique,
    merge_ranks,
    sequential_fold,
    train_merge_table,
)
from data_to_parquet_spark.operators.text import (
    _BPE_MERGES,
    bpe_apply_merges,
    bpe_trie_encoder_agreement,
)

# -- trainer -----------------------------------------------------------------


def test_trainer_hand_computed_merges():
    # corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    # pair counts (weighted): (l,o)=7 (e,s)=9 (s,t)=9 (w,e)=8 ...
    # rank0: tie (e,s)/(s,t) at 9 -> lexicographic picks (e,s)
    # rank1: after es: (es,t)=9 beats (l,o)=7 and (w,e)=8
    # rank2: (w,e)=8  [newest: n,e,w,est -> (w,est) now, so (w,e)
    #         count drops to lower's 2... recompute below]
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_merge_table(counts, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # after est exists: newest=(n,e,w,est), widest=(w,i,d,est),
    # low/lower keep (l,o)=7, (o,w)=7; (n,e)=6, (e,w)=6, (w,est)=6,
    # (d,est)=3, (w,i)=3, (i,d)=3, (o,w,e..): lower adds (w,e)=2,(e,r)=2
    # top is the (l,o)/(o,w) tie at 7 -> lexicographic (l,o)
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")  # lo+w = 7 beats everything at 6


def test_trainer_stops_when_nothing_repeats():
    merges = train_merge_table({"ab": 1, "cd": 1}, 10)
    assert merges == []  # every pair count is 1 — no signal, no merges


@pytest.fixture(scope="module")
def trained_table():
    """A ~1k-merge creation-ordered table trained on a deterministic
    synthetic corpus (seeded Zipf-ish words over the full alphabet) —
    big enough that the replace-chain plan shape is out of the
    question, well-formed because it is genuinely trained."""
    rng = random.Random(0x7B1E)
    alphabet = "etaoinshrdlucmfwypvbgkjqxz0123456789"
    weights = [36 - i for i in range(36)]
    counts: dict[str, int] = {}
    for _ in range(3000):
        n = rng.randint(2, 12)
        w = "".join(rng.choices(alphabet, weights=weights, k=n))
        counts[w] = counts.get(w, 0) + rng.randint(1, 50)
    merges = train_merge_table(counts, 1000)
    assert len(merges) >= 600, len(merges)  # the corpus supports ~1k
    return merges


def test_trained_table_is_creation_ordered(trained_table):
    """The precondition of the priority/sequential equivalence: every
    merge's components are single characters or outputs of STRICTLY
    lower-ranked merges."""
    known = {m[0] + m[1]: r for r, m in enumerate(trained_table)}
    for rank, (a, b) in enumerate(trained_table):
        for part in (a, b):
            assert len(part) == 1 or known[part] < rank, (rank, a, b)


# -- encoder equivalence -----------------------------------------------------

ADVERSARIAL = [
    "the", "thin", "thing", "and", "ant", "inin", "tition", "station",
    "inning", "ererer", "restoration", "a", "x9z",
]


def test_priority_encoder_matches_fold_on_literal_table():
    ranks = merge_ranks(_BPE_MERGES)
    for w in ADVERSARIAL:
        assert encode_token(w, ranks) == sequential_fold(w, _BPE_MERGES), w


def test_priority_encoder_matches_fold_on_trained_table(trained_table):
    """The load-bearing pin: on a genuinely trained ~1k-merge table the
    production priority-merge encoder computes the exact symbol
    sequences of the sequential one-pass-per-merge fold the replace
    chain implements — 800 seeded fuzz tokens over the training
    alphabet plus the adversarial set."""
    ranks = merge_ranks(trained_table)
    rng = random.Random(0x5EED)
    alphabet = "etaoinshrdlucmfwypvbgkjqxz0123456789"
    words = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16)))
            for _ in range(800)
        }
    ) + ADVERSARIAL
    for w in words:
        assert encode_token(w, ranks) == sequential_fold(
            w, trained_table
        ), w


def test_priority_encoder_is_lossless(trained_table):
    """Decode round-trip for the production encoder: concatenating the
    emitted symbols reproduces the token exactly (merges only regroup
    characters, never alter them) — the detokenization integrity
    guarantee, on both the literal and the trained table."""
    rng = random.Random(0xDEC0)
    alphabet = "etaoinshrdlucmfwypvbgkjqxz0123456789"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16)))
        for _ in range(300)
    ] + ADVERSARIAL
    for ranks in (merge_ranks(_BPE_MERGES), merge_ranks(trained_table)):
        for w in words:
            assert "".join(encode_token(w, ranks)) == w, w


def test_encode_unique_memoizes_and_maps():
    import pandas as pd

    ranks = merge_ranks(_BPE_MERGES)
    cache: dict[str, int] = {}
    s = pd.Series(["the", "thing", "the", "x9z", "the"])
    out = encode_unique(s, ranks, cache)
    assert out.tolist() == [1, 2, 1, 3, 1]
    assert str(out.dtype) == "int64"
    assert cache == {"the": 1, "thing": 2, "x9z": 3}
    # second batch reuses the memo (and extends it)
    out2 = encode_unique(pd.Series(["the", "ant"]), ranks, cache)
    assert out2.tolist() == [1, 2] and cache["ant"] == 2


# -- the same-slot swap ------------------------------------------------------


def test_udf_variant_equals_literal_operator_on_corpus(spark, sf_dir):
    lit = {
        r["doc_id"]: tuple(r) for r in bpe_apply_merges(spark, sf_dir).collect()
    }
    udf = {
        r["doc_id"]: tuple(r)
        for r in bpe_apply_merges_udf(spark, sf_dir).collect()
    }
    assert lit == udf and len(lit) > 0


def test_udf_variant_with_trained_table_runs(spark, sf_dir, trained_table):
    """The actual production shape — the BIG table through the same
    slot: spot-check one document's accounting against a driver-side
    re-encode of its tokens with the reference fold."""
    import re

    row = (
        bpe_apply_merges_udf(spark, sf_dir, merges=trained_table)
        .orderBy("doc_id")
        .first()
    )
    from data_to_parquet_spark.operators.base import load_table

    text = (
        load_table(spark, sf_dir, "documents")
        .filter(f"doc_id = {row['doc_id']}")
        .first()["text"]
    )
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    n_sym = sum(len(sequential_fold(t, trained_table)) for t in toks)
    assert row["n_word_tokens"] == len(toks)
    assert row["n_bpe_tokens"] == n_sym


# -- driver-facing audit -----------------------------------------------------


def test_agreement_audit_reports_perfect_agreement(spark, sf_dir):
    r = bpe_trie_encoder_agreement(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_tokens"] > 0
    assert row["n_tokens_agree"] == row["n_tokens"]
    assert row["n_trie_symbols"] == row["n_chain_symbols"]
    assert 0 < row["n_distinct_tokens"] <= row["n_tokens"]
