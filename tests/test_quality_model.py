"""Pins for the round-10 model-scored quality gate: the vectorized
batch-inference kernel must agree with a naive per-document scorer
computed independently (hashlib + pure Python), and the md5-derived
weight table must be deterministic and in-range. The cross-engine value
check is tests/test_oracle_parity.py::quality_model_score; this guards
the kernel's vectorization (factorize/bincount) against refactors
without involving DuckDB."""

from __future__ import annotations

import hashlib
import math
import re

from data_to_parquet_spark.operators.pipeline import (
    _QMS_BUCKETS,
    _qms_weight_table,
    quality_model_score,
)


def _naive_score(text: str):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    feats = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
    w_sum = 0
    for f in feats:
        b = int(hashlib.md5(f"f:{f}".encode()).hexdigest()[:8], 16) % _QMS_BUCKETS
        w_sum += (
            int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16) % 2001
            - 1000
        )
    return len(feats), w_sum


def test_weight_table_deterministic_and_bounded():
    w = _qms_weight_table()
    assert len(w) == _QMS_BUCKETS
    assert w.min() >= -1000 and w.max() <= 1000
    # spot-pin one derivation so a convention drift (hex slice, prefix,
    # modulus) fails loudly rather than silently re-deriving everything
    b = 7
    expect = int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000
    assert w[b] == expect


def test_kernel_matches_naive_scorer(spark, tmp_path):
    docs = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "spark spark spark shuffle broadcast join"),
        (3, "a b a b a b"),  # heavy repetition: multiset feature counting
        (4, "singleword"),  # no bigrams
        (5, "!!! ???"),  # zero tokens -> dropped from output
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in quality_model_score(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for doc_id, text in docs[:4]:
        n, w_sum = _naive_score(text)
        r = out[doc_id]
        assert r["n_features"] == n
        assert r["w_milli_sum"] == w_sum
        expect_score = round(
            1.0 / (1.0 + math.exp(-(w_sum / (1000.0 * n)))), 9
        )
        assert abs(r["quality_score"] - expect_score) < 1e-9
        assert r["keep"] == (w_sum > 0)


def test_kernel_matches_naive_on_random_corpus(spark, tmp_path):
    """Seeded-random corpus (varied lengths, repetition, collisions,
    punctuation, digits) — the vectorized factorize/bincount path must
    agree with the naive scorer on every document."""
    import random

    rng = random.Random(20260815)
    vocab = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(rng.randint(1, 8)))
        for _ in range(200)
    ]
    docs = []
    for doc_id in range(50):
        n = rng.randint(1, 120)
        words = [rng.choice(vocab) for _ in range(n)]
        # sprinkle punctuation/casing the JVM tokenizer must strip
        text = " ".join(
            w.upper() if rng.random() < 0.2 else w for w in words
        )
        if rng.random() < 0.3:
            text = "!! " + text + " ??"
        docs.append((doc_id, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in quality_model_score(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(range(50))
    for doc_id, text in docs:
        n, w_sum = _naive_score(text)
        assert out[doc_id]["n_features"] == n, doc_id
        assert out[doc_id]["w_milli_sum"] == w_sum, doc_id
