"""Pins for the round-11 embedding-generation stage: the vectorized
hashed-projection kernel must agree with a naive per-document encoder
(hashlib + pure Python), the generated unit vectors must actually be
unit-norm, and — the reason the stage exists — they must drop into the
existing k-means dataflow unchanged. The cross-engine value check is
tests/test_oracle_parity.py::embedding_generate_hashed; these guard the
kernel's vectorization (factorize/np.add.at) and the consumer contract
without involving DuckDB."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np

from data_to_parquet_spark.operators.pipeline import (
    _EMB_DIM,
    embedding_generate_hashed,
    generated_embeddings,
)


def _naive_embed(text: str):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    sums = [0] * _EMB_DIM
    for t in toks:
        b = int(hashlib.md5(("e:" + t).encode()).hexdigest()[:8], 16) % _EMB_DIM
        s = 1 if int(hashlib.md5(("s:" + t).encode()).hexdigest()[:8], 16) % 2 == 0 else -1
        sums[b] += s
    return len(toks), sums


def test_kernel_matches_naive_encoder(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(50)
        .collect()
    }
    got = {
        r["doc_id"]: r
        for r in embedding_generate_hashed(spark, sf_dir)
        .filter("doc_id IN ({})".format(",".join(map(str, docs))))
        .collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        n, sums = _naive_embed(text)
        assert got[doc_id]["n_tokens"] == n
        assert got[doc_id]["emb_sums_csv"] == ",".join(map(str, sums))
        # l2_norm ships unrounded (r11 s2): sqrt of an exact int64 is
        # IEEE-identical across engines AND in this python replay
        expect_norm = math.sqrt(sum(x * x for x in sums))
        assert got[doc_id]["l2_norm"] == expect_norm


def test_generated_vectors_are_unit_norm(spark, sf_dir):
    rows = generated_embeddings(spark, sf_dir).collect()
    assert all(len(r["embedding"]) == _EMB_DIM for r in rows)
    norms = np.array(
        [math.sqrt(sum(x * x for x in r["embedding"])) for r in rows]
    )
    nonzero = norms[norms > 0]
    assert len(nonzero) > 0
    np.testing.assert_allclose(nonzero, 1.0, rtol=1e-12)
    # zero-token docs (if any) stay the exact zero vector
    for r in rows:
        if sum(abs(x) for x in r["embedding"]) == 0:
            assert all(x == 0.0 for x in r["embedding"])


def test_generated_vectors_feed_kmeans(spark, sf_dir):
    """The consumer contract: generated vectors run through the SAME
    Lloyd trainer the IVF/semdedup quantizers use (ops.lloyd_centroids),
    producing a full set of finite centroids — the embed stage feeds the
    existing index-building dataflows without any adapter."""
    from data_to_parquet_spark.ops import lloyd_centroids

    vecs = generated_embeddings(spark, sf_dir)
    cents, corpus = lloyd_centroids(
        vecs, "vec_id", "embedding", k=4, iterations=2
    )
    assert cents.shape == (4, _EMB_DIM)
    assert np.isfinite(cents).all()
    assert corpus.count() == vecs.count()


def test_generated_topk_matches_numpy(spark, sf_dir):
    """Engine-independent pin for the end-to-end embed->search path:
    replay encode + exact cosine top-k in numpy and require identical
    (query, rank) -> neighbor assignments and cosines to 1e-12."""
    from data_to_parquet_spark.operators.pipeline import (
        _GEN_TOPK_K,
        _GEN_TOPK_QUERIES,
        generated_embedding_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ids, mat = [], []
    for r in docs:
        _, sums = _naive_embed(r["text"])
        v = np.asarray(sums, dtype="float64")
        n = math.sqrt(float(v @ v))
        if n > 0:
            ids.append(r["doc_id"])
            mat.append(v / n)
    ids = np.asarray(ids)
    mat = np.vstack(mat)
    norms = np.sqrt((mat * mat).sum(axis=1))

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in generated_embedding_topk(spark, sf_dir).collect()
    }
    n_queries = int((ids < _GEN_TOPK_QUERIES).sum())
    assert len(got) == n_queries * _GEN_TOPK_K
    for qpos in np.where(ids < _GEN_TOPK_QUERIES)[0]:
        qid = int(ids[qpos])
        cos = (mat @ mat[qpos]) / (norms * norms[qpos])
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-cos[i], ids[i]),
        )[:_GEN_TOPK_K]
        for rank, i in enumerate(order, start=1):
            nb, c = got[(qid, rank)]
            assert nb == ids[i], (qid, rank, nb, ids[i])
            assert abs(c - cos[i]) < 1e-12
