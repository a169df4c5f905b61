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


# ---- session-2 generic ops: randomized invariants ------------------------


def _random_events(seed: int, n: int = 60, n_keys: int = 5):
    rng = random.Random(seed)
    return [
        (
            rng.randrange(n_keys),
            i,  # unique order tiebreaker
            rng.choice(["a", "b", "c"]),
            rng.randint(-50, 50),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("seed", range(3))
def test_transition_matrix_probs_sum_to_one(spark, seed):
    rows = _random_events(seed)
    df = spark.createDataFrame(rows, "k long, t long, s string, d long")
    out = ops.transition_matrix(df, "k", ["t"], "s").collect()
    # per prev_state, probabilities sum to 1 and n matches a brute count
    by_prev: dict[str, float] = {}
    for r in out:
        by_prev[r["prev_state"]] = by_prev.get(r["prev_state"], 0.0) + r["prob"]
    assert all(abs(v - 1.0) < 1e-9 for v in by_prev.values())
    brute: dict[tuple, int] = {}
    seqs: dict[int, list] = {}
    for k, t, s, _ in sorted(rows, key=lambda r: (r[0], r[1])):
        seqs.setdefault(k, []).append(s)
    for seq in seqs.values():
        for p, nx in zip(seq, seq[1:]):
            brute[(p, nx)] = brute.get((p, nx), 0) + 1
    assert {(r["prev_state"], r["next_state"]): r["n"] for r in out} == brute


@pytest.mark.parametrize("seed", range(3))
def test_clamped_fold_matches_sequential_reference(spark, seed):
    rows = _random_events(seed)
    df = spark.createDataFrame(rows, "k long, t long, s string, d long")
    out = {
        r["k"]: r["final_value"]
        for r in ops.clamped_fold(df, "k", ["t"], "d", floor=0).collect()
    }
    ref: dict[int, int] = {}
    for k, t, _, d in sorted(rows, key=lambda r: (r[0], r[1])):
        ref[k] = max(ref.get(k, 0) + d, 0)
    assert out == ref
    assert all(v >= 0 for v in out.values())


@pytest.mark.parametrize("seed", range(3))
def test_snapshot_diff_roundtrip_invariants(spark, seed):
    rng = random.Random(seed)
    old_rows = [(i, float(rng.randint(0, 5))) for i in range(30)]
    df = spark.createDataFrame(old_rows, "id long, v double")
    # identical snapshots diff to empty
    assert ops.snapshot_diff(df, df, "id", ["v"]).count() == 0
    # a known perturbation is reported exactly once per affected key
    new_rows = [(i, v + (1.0 if i % 7 == 0 else 0.0))
                for i, v in old_rows if i % 11 != 0]
    new_rows.append((999, 1.0))
    df2 = spark.createDataFrame(new_rows, "id long, v double")
    out = {r["id"]: r["change_type"]
           for r in ops.snapshot_diff(df, df2, "id", ["v"]).collect()}
    expect = {i: "changed" for i, _ in old_rows if i % 7 == 0 and i % 11 != 0}
    expect.update({i: "removed" for i, _ in old_rows if i % 11 == 0})
    expect[999] = "added"
    assert out == expect


@pytest.mark.parametrize("seed", range(3))
def test_mad_outliers_never_flags_majority(spark, seed):
    rng = random.Random(seed)
    rows = [("g", float(rng.randint(10, 20))) for _ in range(50)]
    rows += [("g", 1000.0)]  # one gross outlier
    df = spark.createDataFrame(rows, "g string, v double")
    out = ops.mad_outliers(df, "g", "v").collect()
    flagged = [r["v"] for r in out if r["is_outlier"]]
    assert 1000.0 in flagged
    # MAD breakdown point: a single outlier cannot drag the fence over
    # the bulk of the data
    assert len(flagged) < len(rows) / 2


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("floor", [-5, 3])
def test_clamped_fold_nonzero_floor(spark, seed, floor):
    """The closed form must hold for NON-zero floors too (the round-5
    first attempt was only correct at floor=0 — caught by brute force)."""
    rows = _random_events(seed, n=40)
    df = spark.createDataFrame(rows, "k long, t long, s string, d long")
    out = {
        r["k"]: r["final_value"]
        for r in ops.clamped_fold(df, "k", ["t"], "d", floor=floor).collect()
    }
    ref: dict[int, int] = {}
    for k, t, _, d in sorted(rows, key=lambda r: (r[0], r[1])):
        ref[k] = max(ref.get(k, 0) + d, floor)
    assert out == ref


def _brute_containment(docs, threshold, min_tokens, max_jaccard):
    toks = {
        i: set(re.split(r"[^a-z0-9]+", t.lower())) - {""} for i, t in docs
    }
    out = {}
    for a in toks:
        for b in toks:
            if a == b or len(toks[a]) < min_tokens or not toks[a]:
                continue
            if len(toks[a]) > len(toks[b]) or (
                len(toks[a]) == len(toks[b]) and a >= b
            ):
                continue
            inter = len(toks[a] & toks[b])
            cont = inter / len(toks[a])
            jac = inter / (len(toks[a]) + len(toks[b]) - inter)
            if cont >= threshold and (
                max_jaccard is None or jac < max_jaccard
            ):
                out[(a, b)] = round(cont, 9)
    return out


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("max_jaccard", [None, 0.9])
def test_containment_prefix_matches_bruteforce(spark, seed, max_jaccard):
    docs = _random_docs(seed, n=35, max_len=10)
    df = spark.createDataFrame(docs, "pk long, body string")
    got = {
        (r["id_inner"], r["id_outer"]): round(r["containment"], 9)
        for r in ops.neardup_containment_prefix(
            df,
            "pk",
            "body",
            threshold=0.7,
            min_tokens=2,
            max_jaccard=max_jaccard,
        ).collect()
    }
    assert got == _brute_containment(docs, 0.7, 2, max_jaccard)


@pytest.mark.parametrize("seed", range(3))
def test_passage_stride_covers_every_window(spark, seed):
    # sliding form ground truth: a span is duplicated iff the identical
    # w-token window text appears in >= 2 docs
    docs = _random_docs(seed, n=25, max_len=14)
    w = 4
    df = spark.createDataFrame(docs, "pk long, body string")
    got = {
        r["pk"]: (r["n_passages"], r["n_dup_passages"])
        for r in ops.passage_dup_stats(
            df, "pk", "body", passage_tokens=w, stride=1
        ).collect()
    }
    windows = {}
    for i, t in docs:
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        ws = [
            " ".join(toks[j : j + w]) for j in range(len(toks) - w + 1)
        ]
        windows[i] = ws
    docs_with = {}
    for i, ws in windows.items():
        for x in set(ws):
            docs_with.setdefault(x, set()).add(i)
    for i, ws in windows.items():
        if not ws:
            assert i not in got
            continue
        dup = sum(1 for x in ws if len(docs_with[x]) >= 2)
        assert got[i] == (len(ws), dup), (i, got.get(i), len(ws), dup)
