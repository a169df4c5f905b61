"""Pins for `neardup_graph_pagerank`: the distributed 10-iteration PageRank
must match a dense numpy power iteration of the SAME Google matrix (same
damping, same dangling handling, same iteration count) on the full vertex
set, and conserve rank mass.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_to_parquet_spark.operators.dedup import (
    _PR_DAMPING,
    _PR_ITERS,
    _PR_TOPK,
    neardup_graph_pagerank,
    neardup_jaccard_pairs,
)


def _numpy_pagerank(spark, sf_dir):
    docs = [
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    idx = {d: i for i, d in enumerate(docs)}
    n = len(docs)
    pairs = neardup_jaccard_pairs(spark, sf_dir).collect()
    adj = np.zeros((n, n))
    for r in pairs:
        a, b = idx[r["doc_a"]], idx[r["doc_b"]]
        adj[a, b] = adj[b, a] = 1.0
    deg = adj.sum(axis=1)
    rank = np.full(n, 1.0 / n)
    for _ in range(_PR_ITERS):
        dangling = rank[deg == 0].sum()
        contrib = adj.T @ np.where(deg > 0, rank / np.maximum(deg, 1), 0.0)
        rank = (1 - _PR_DAMPING) / n + _PR_DAMPING * (
            contrib + dangling / n
        )
    return docs, idx, rank, deg


def test_pagerank_matches_numpy(spark, sf_dir):
    docs, idx, rank, deg = _numpy_pagerank(spark, sf_dir)
    n = len(docs)
    got = neardup_graph_pagerank(spark, sf_dir).collect()
    assert len(got) == min(_PR_TOPK, n)
    for r in got:
        i = idx[r["doc_id"]]
        assert abs(r["rank_x_n"] - rank[i] * n) < 1e-6, (
            r["doc_id"],
            r["rank_x_n"],
            rank[i] * n,
        )
        assert r["deg"] == int(deg[i])
    # the returned rows are the true top-k UP TO TIES: symmetric graph
    # positions produce mathematically equal ranks whose float sums differ
    # in reduce-order-dependent ulps, so exact sequence equality between
    # two independent summation orders (Spark vs numpy) is not a valid
    # invariant. Pin instead: (a) the returned list is sorted
    # non-increasing by the numpy rank within 1e-6, and (b) every
    # returned doc ranks within 1e-6 of the k-th largest numpy rank —
    # i.e. membership is the true top-k modulo tie-group rotation.
    got_ranks = [rank[idx[r["doc_id"]]] * n for r in got]
    for a, b in zip(got_ranks, got_ranks[1:]):
        assert a >= b - 1e-6
    kth = sorted((rank * n).tolist(), reverse=True)[len(got) - 1]
    assert all(g >= kth - 1e-6 for g in got_ranks)


def test_pagerank_mass_conservation(spark, sf_dir):
    docs, idx, rank, deg = _numpy_pagerank(spark, sf_dir)
    # the numpy reference itself: mass stays 1.0 through the iterations —
    # any drift means the dangling redistribution is wrong on both sides
    assert abs(rank.sum() - 1.0) < 1e-9
