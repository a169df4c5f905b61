"""Production-scale BPE encoding: trainer + priority-merge (trie-style)
encoder behind an Arrow-batched Pandas UDF.

Why this module exists (r14 VERDICT item 3): `bpe_apply_merges`
(operators/text.py) encodes against its 16-entry literal merge table as
a chain of whole-stage-codegen string replaces — the right shape for a
small plan-literal vocabulary, but a 100k-merge production tokenizer
cannot be a 100k-deep expression tree. Its docstring promises the swap:
"a 100k-merge production table swaps the literal chain for a Pandas-UDF
trie encoder in the same slot". This module IS that swap, with the
equivalence proved rather than asserted:

* ``train_merge_table`` — a deterministic reference BPE trainer (the
  iterated form of `bpe_first_merges`' single distributed step), used
  to generate a well-formed ~1k-merge table for the equality pins;
* ``encode_token`` — the priority-merge encoder every production
  tokenizer runs (repeatedly merge the lowest-rank adjacent pair;
  GPT-2/HF `bpe()` shape), memoized per unique token;
* ``bpe_encode_udf`` — the Arrow-batched Pandas UDF: one Python call
  per ~10k-row batch, encoding each DISTINCT token once per batch and
  broadcasting counts back via a pandas map — never row-at-a-time;
* ``bpe_apply_merges_udf`` — `bpe_apply_merges` with the replace chain
  swapped for the UDF, byte-identical output schema and values.

Equivalence contract (pinned in tests/test_bpe_trie.py): for any
CREATION-ORDERED merge table — each merge's components are single
characters or outputs of strictly lower-ranked merges, which is how
every trained table is born — the priority-merge encoder computes the
same symbol sequence as the sequential one-greedy-pass-per-merge fold
that `_bpe_encode_expr`'s replace chain implements. Sketch: once all
pairs of rank < r are exhausted, applying the rank-r merge cannot
create any pair of rank < r (its components were all created before
rank r existed), so "globally lowest rank first" and "ranks in order,
one exhaustive pass each" perform the identical merges. The tests pin
this on the 16-merge literal table (UDF vs the Spark replace chain vs
DuckDB, symbol-for-symbol), on a trained ~1k-merge table (UDF vs the
sequential reference fold, fuzzed), and as a full-DataFrame equality of
`bpe_apply_merges_udf` vs `bpe_apply_merges` on the shipped corpus.

Scale: the UDF slots into the identical narrow-map plan — tokenize,
explode, encode, one map-side-combined groupBy(doc_id). Arrow moves
only the token column; the per-batch distinct-encode memo makes the
amortized cost per token a dict lookup (natural-language batches repeat
tokens heavily — Zipf gives ~5-10x dedup even at 10k rows). The merge
ranks dict rides to executors once per task via closure capture
(~100k-entry dict ≈ a few MB — the broadcast-variable slot if it ever
grows past that). Measured in tools/bpe_trie_probe.py (SCALING.md):
the 1k-merge UDF holds token-linear throughput where a 1k-deep replace
chain is not even plannable.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "train_merge_table",
    "merge_ranks",
    "encode_token",
    "sequential_fold",
    "encode_unique",
    "bpe_encode_udf",
    "bpe_apply_merges_udf",
]


# -- reference trainer -------------------------------------------------------


def train_merge_table(
    token_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Deterministic BPE training over a ``{token: count}`` corpus:
    repeatedly merge the most frequent adjacent symbol pair, ties broken
    lexicographically (the same ``ORDER BY n DESC, pair`` rule
    `bpe_first_merges` pins), until ``n_merges`` merges are learned or
    no pair repeats. The output is CREATION-ORDERED by construction —
    every merge's components exist when it is learned — which is the
    precondition for the priority/sequential encoder equivalence.

    This is the reference-speed trainer (pair recount per iteration,
    O(n_merges * corpus symbols) on the word-level counts): its job is
    generating well-formed test tables and pinning semantics, not
    training on 100 TB — the distributed trainer iterates
    `bpe_first_merges`' explode/count shape with this exact merge rule.
    """
    # work on symbol tuples; weight every pair count by the token count
    corpus: dict[tuple[str, ...], int] = {}
    for tok, cnt in token_counts.items():
        key = tuple(tok)
        corpus[key] = corpus.get(key, 0) + cnt
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in corpus.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        best, n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:  # nothing repeats — further merges are noise
            break
        merges.append(best)
        a, b = best
        new_corpus: dict[tuple[str, ...], int] = {}
        for syms, cnt in corpus.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            key = tuple(out)
            new_corpus[key] = new_corpus.get(key, 0) + cnt
        corpus = new_corpus
    return merges


# -- encoders ----------------------------------------------------------------


def merge_ranks(
    merges: list[tuple[str, str]],
) -> dict[tuple[str, str], int]:
    """{pair: rank} — rank is creation order, lower merges first."""
    return {pair: rank for rank, pair in enumerate(merges)}


def sequential_fold(
    tok: str, merges: list[tuple[str, str]]
) -> tuple[str, ...]:
    """The replace-chain semantics spelled in Python: one greedy
    left-to-right pass per merge, in rank order (the fold
    `_bpe_encode_expr` compiles to SQL and tests/test_bpe_apply.py
    pins). Kept here so the big-table equality pins compare the
    production encoder against the exact promised semantics."""
    syms: list[str] = list(tok)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return tuple(syms)


def encode_token(
    tok: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Priority-merge BPE encode of one token: repeatedly merge every
    occurrence (leftmost-first) of the lowest-rank adjacent pair
    present, until no adjacent pair is in the table — the standard
    production encoder. Equals ``sequential_fold`` on any
    creation-ordered table (see module docstring; pinned in tests).

    O(len * merges_applied) with a scan per round: tokens are words
    (len <= ~20 after the shared tokenizer), so the constant-factor
    simple scan beats heap bookkeeping in CPython.
    """
    syms: list[str] = list(tok)
    while len(syms) > 1:
        best_rank: int | None = None
        best_pair: tuple[str, str] | None = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return tuple(syms)


def encode_unique(
    tokens: pd.Series,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, int],
) -> pd.Series:
    """Symbol COUNT per token for a pandas batch, encoding each distinct
    token once (then a vectorized map). ``cache`` persists across
    batches of one task — Zipf repetition makes the steady-state cost a
    hash lookup per token."""
    for tok in pd.unique(tokens):
        if tok not in cache:
            cache[tok] = len(encode_token(tok, ranks))
    return tokens.map(cache).astype("int64")


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched Pandas UDF: token column -> BPE symbol count under
    ``merges``. The ranks dict and the per-executor memo live in the
    UDF closure; Arrow moves one string column in, one int64 column
    out. This is the production slot for a 100k-merge table — the plan
    around it is identical to the literal replace chain's."""
    ranks = merge_ranks(merges)
    cache: dict[str, int] = {}

    @pandas_udf("long")
    def n_bpe_symbols(tokens: pd.Series) -> pd.Series:
        return encode_unique(tokens, ranks, cache)

    return n_bpe_symbols


def bpe_apply_merges_udf(spark, sf_dir, merges=None):
    """`bpe_apply_merges` with the codegen replace chain swapped for the
    Pandas-UDF priority-merge encoder — the same-slot swap the literal
    operator's docstring promises. Identical output schema and (for the
    default ``_BPE_MERGES`` table) identical values, pinned as a full
    DataFrame equality in tests/test_bpe_trie.py.

    Not registered as its own driver query: the encoder's cross-engine
    evidence is `bpe_trie_encoder_agreement` (operators/text.py), which
    runs BOTH encoders and lets the DuckDB oracle catch any divergence
    through the agreement counts.
    """
    from data_to_parquet_spark.operators.base import load_table
    from data_to_parquet_spark.operators.text import _BPE_MERGES

    from .exprs import exploded_rows, tokens

    enc_udf = bpe_encode_udf(_BPE_MERGES if merges is None else merges)
    d = load_table(spark, sf_dir, "documents")
    toks = exploded_rows(d, ["doc_id"], tokens(F.col("text")), "t")
    enc = toks.select(
        "doc_id",
        F.length("t").alias("n_chars"),
        enc_udf(F.col("t")).alias("n_sym"),
    )
    g = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_word_tokens"),
        F.sum(F.col("n_chars").cast("long")).alias("n_token_chars"),
        F.sum("n_sym").alias("n_bpe_tokens"),
    )
    return g.select(
        "doc_id",
        "n_word_tokens",
        "n_token_chars",
        "n_bpe_tokens",
        (
            F.col("n_token_chars").cast("double") / F.col("n_bpe_tokens")
        ).alias("chars_per_bpe_token"),
    )
