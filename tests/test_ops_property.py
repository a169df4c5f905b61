"""Randomized brute-force cross-checks for the ops library.

The indexed set-similarity joins (prefix-filter and posting-count — both
advertised as EXACT) and the contraction-based connected components must
agree exactly with O(n²) / union-find references on arbitrary random
inputs, including empty documents, identical documents, self-loops, and
disconnected nodes. Seeded generators keep every example reproducible.
"""

from __future__ import annotations

import random
import re

import pytest

from data_to_parquet_spark import ops

_VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma",
]


def _random_docs(seed: int, n: int = 40, max_len: int = 12):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        words = [rng.choice(_VOCAB) for _ in range(rng.randint(0, max_len))]
        docs.append((i, " ".join(words)))
    # force exact-duplicate and empty edge cases into every example
    docs[1] = (1, docs[0][1])
    docs[2] = (2, "")
    docs[3] = (3, "...")  # tokenizes to the empty set
    return docs


def _brute_jaccard(docs, threshold: float):
    toks = {
        i: set(re.split(r"[^a-z0-9]+", t.lower())) - {""} for i, t in docs
    }
    out = {}
    for i in toks:
        for j in toks:
            if i < j:
                union = len(toks[i] | toks[j])
                if union == 0:
                    continue
                jac = len(toks[i] & toks[j]) / union
                if jac >= threshold:
                    out[(i, j)] = jac
    return out


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize(
    "fn,threshold",
    [
        (ops.neardup_jaccard_prefix, 0.6),
        (ops.neardup_jaccard_count, 0.2),
    ],
    ids=["prefix-0.6", "count-0.2"],
)
def test_jaccard_index_joins_match_bruteforce(spark, seed, fn, threshold):
    docs = _random_docs(seed)
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in fn(df, "id", "text", threshold=threshold).collect()
    }
    want = _brute_jaccard(docs, threshold)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


def _union_find_components(edges):
    nodes = {u for e in edges for u in e}
    parent = {u: u for u in nodes}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comps: dict[int, list[int]] = {}
    for u in nodes:
        comps.setdefault(find(u), []).append(u)
    return {u: min(members) for members in comps.values() for u in members}


@pytest.mark.parametrize("seed", range(4))
def test_connected_components_match_union_find(spark, seed):
    rng = random.Random(100 + seed)
    n = rng.randint(2, 40)
    m = rng.randint(1, 60)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r["node"]: r["component"]
        for r in ops.connected_components(df, "u", "v").collect()
    }
    assert got == _union_find_components(edges)
