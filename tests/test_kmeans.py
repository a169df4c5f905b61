"""Pins for `kmeans_embedding_clusters`: the distributed Lloyd run must
match a dense numpy Lloyd run with IDENTICAL init (k lowest vec_ids),
iteration count, and tie rule (argmin -> lowest cluster index). Cluster
sizes must match exactly; inertia within float tolerance (the distributed
per-dim sums reduce in a different order than numpy's)."""

from __future__ import annotations

import numpy as np

from data_to_parquet_spark.operators.similarity import (
    _KM_ITERS,
    _KM_K,
    kmeans_embedding_clusters,
)


def _numpy_lloyd(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    m = np.vstack([r["embedding"] for r in rows]).astype("float64")
    cts = m[:_KM_K].copy()
    for _ in range(_KM_ITERS):
        d2 = ((m[:, None, :] - cts[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(_KM_K):
            mem = m[a == c]
            if len(mem):
                cts[c] = mem.mean(axis=0)
    d2 = ((m[:, None, :] - cts[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(a)), a], cts


def test_kmeans_matches_numpy(spark, sf_dir):
    a, d2, cts = _numpy_lloyd(spark, sf_dir)
    got = {r["cluster"]: r for r in kmeans_embedding_clusters(spark, sf_dir).collect()}
    present = sorted(set(a.tolist()))
    assert sorted(got) == present
    for c in present:
        assert got[c]["n_members"] == int((a == c).sum())
        expect_inertia = float(d2[a == c].sum())
        assert abs(got[c]["inertia"] - expect_inertia) < max(
            1e-3, 1e-6 * abs(expect_inertia)
        ), (c, got[c]["inertia"], expect_inertia)
        assert abs(
            got[c]["centroid_norm"] - float(np.sqrt((cts[c] ** 2).sum()))
        ) < 1e-5


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = kmeans_embedding_clusters(spark, sf_dir).collect()
    assert sum(r["n_members"] for r in rows) == n
    assert all(r["inertia"] >= 0.0 for r in rows)
