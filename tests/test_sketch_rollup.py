"""Pins for shard_sketch_rollup and shard_quantile_rollup
(operators/pipeline.py): the mergeable HLL / KLL shard rollup pair.

- The raw per-shard and merged-union estimates must stay inside the 5%
  envelope the registered query's bucket claims (the oracle carries the
  bucket as literal TRUE, so these asserts are the early warning before
  a driver hash goes red — the `_sketch_report_full` pattern).
- On a tiny corpus the lg_k=12 sketch is in exact (sparse) mode, so the
  estimates — including the merged union — must equal the exact counts
  EXACTLY, pinned against a hand-derived shingle vocabulary.
- Short docs (< 3 tokens) emit no shingles (`strict_shingles`); a corpus
  made only of those must yield all-zero counts with TRUE buckets in
  both engines.
"""

from __future__ import annotations

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from data_to_parquet_spark.operators.pipeline import (
    _SHARD_N,
    _SKROLL_ERR,
    _shard_sketch_full,
    shard_sketch_rollup,
)

_ORACLE = entry_mod.oracle_sql()["shard_sketch_rollup"]


def _write_docs(root, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(root / "documents.parquet")
    return str(root)


def test_raw_estimates_inside_envelope(spark, sf_dir):
    rows = _shard_sketch_full(spark, sf_dir).collect()
    assert len(rows) == _SHARD_N + 1
    assert sorted(r["shard_id"] for r in rows) == list(range(-1, _SHARD_N))
    for r in rows:
        assert r["exact_distinct_shingles"] > 0
        rel = (
            abs(r["estimate"] - r["exact_distinct_shingles"])
            / r["exact_distinct_shingles"]
        )
        assert rel <= _SKROLL_ERR, (
            f"shard {r['shard_id']}: estimate {r['estimate']} vs exact "
            f"{r['exact_distinct_shingles']} — rel error {rel:.4f}"
        )


def test_bucketed_query_agrees_with_full_frame(spark, sf_dir):
    full = {
        r["shard_id"]: r for r in _shard_sketch_full(spark, sf_dir).collect()
    }
    for r in shard_sketch_rollup(spark, sf_dir).collect():
        f = full[r["shard_id"]]
        assert r["n_docs"] == f["n_docs"]
        assert r["exact_distinct_shingles"] == f["exact_distinct_shingles"]
        assert r["est_within_5pct"] is True


def test_sparse_mode_exact_on_tiny_corpus(spark, tmp_path):
    # 6 docs over a tiny token space: every shard's cardinality is far
    # under the sketch's sparse-mode capacity, so per-shard estimates AND
    # the merged union must be exactly the hand-derived distinct counts
    texts = [f"a{i} b{i} c{i} d{i}" for i in range(6)]
    sf_dir = _write_docs(tmp_path, texts)

    def h_shard(doc_id: int) -> int:
        import hashlib

        return (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            % _SHARD_N
        )

    shards: dict[int, set] = {}
    corpus = set()
    for i, t in enumerate(texts):
        toks = t.split()
        sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        shards.setdefault(h_shard(i), set()).update(sh)
        corpus |= sh
    rows = {
        r["shard_id"]: r for r in _shard_sketch_full(spark, sf_dir).collect()
    }
    assert len(rows) == len(shards) + 1
    for sid, sset in shards.items():
        assert rows[sid]["exact_distinct_shingles"] == len(sset)
        assert rows[sid]["estimate"] == len(sset)  # sparse mode: exact
    assert rows[-1]["exact_distinct_shingles"] == len(corpus)
    assert rows[-1]["estimate"] == len(corpus)  # union of sparse: exact


def test_short_docs_zero_shingles_matches_oracle(spark, tmp_path):
    # every doc under 3 tokens -> strict_shingles emits nothing; exact
    # counts are 0 everywhere, buckets stay TRUE, and Spark agrees with
    # the DuckDB oracle row-for-row (the LEFT JOIN / COALESCE(0) path)
    sf_dir = _write_docs(tmp_path, ["one two", "x", "y z", "w"])
    got = sorted(
        (
            r["shard_id"],
            r["n_docs"],
            r["exact_distinct_shingles"],
            r["est_within_5pct"],
        )
        for r in shard_sketch_rollup(spark, sf_dir).collect()
    )
    assert all(g[2] == 0 and g[3] for g in got)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (r[0], r[1], r[2], bool(r[3]))
        for r in con.execute(_ORACLE).fetchall()
    )
    con.close()
    assert got == want


def test_merged_union_close_to_direct_exact(spark, sf_dir):
    """The corpus row's estimate comes from FOLDING 16 fixed-size shard
    states, not from a corpus re-scan — pin that this two-level path
    stays within half the envelope of the exact corpus vocabulary on the
    shipped corpus (measured <=1.5% at every sf)."""
    rows = {
        r["shard_id"]: r for r in _shard_sketch_full(spark, sf_dir).collect()
    }
    corpus = rows[-1]
    rel = (
        abs(corpus["estimate"] - corpus["exact_distinct_shingles"])
        / corpus["exact_distinct_shingles"]
    )
    assert rel <= _SKROLL_ERR / 2
    # conservation: per-shard exacts are disjoint unions of the corpus
    # vocabulary only if no shingle crosses shards — generally they
    # overlap, so the sum must be >= the corpus exact
    assert (
        sum(
            r["exact_distinct_shingles"]
            for sid, r in rows.items()
            if sid >= 0
        )
        >= corpus["exact_distinct_shingles"]
    )


def test_quantile_raw_deviations_inside_envelope(spark, sf_dir):
    from data_to_parquet_spark.operators.pipeline import (
        _SKQ_RANK_ERR,
        _shard_quantile_full,
    )

    rows = _shard_quantile_full(spark, sf_dir).collect()
    assert sorted(r["shard_id"] for r in rows) == list(range(-1, _SHARD_N))
    for r in rows:
        assert r["rank_err"] <= _SKQ_RANK_ERR, (
            f"shard {r['shard_id']}: KLL p50 {r['est_p50']} has midpoint "
            f"rank deviation {r['rank_err']:.4f}"
        )
    # the merged-union estimate is far better than the shard envelope
    # (measured <=0.002 at every sf): pin half the envelope
    assert {r["shard_id"]: r for r in rows}[-1]["rank_err"] <= (
        _SKQ_RANK_ERR / 2
    )


def test_quantile_bucketed_query_agrees_with_full_frame(spark, sf_dir):
    from data_to_parquet_spark.operators.pipeline import (
        _SKQ_RANK_ERR,
        _shard_quantile_full,
        shard_quantile_rollup,
    )

    full = {
        r["shard_id"]: r
        for r in _shard_quantile_full(spark, sf_dir).collect()
    }
    for r in shard_quantile_rollup(spark, sf_dir).collect():
        f = full[r["shard_id"]]
        assert r["n_docs"] == f["n_docs"]
        assert r["exact_p50_tokens"] == f["exact_p50_tokens"]
        assert r["rank_err_le_10pct"] == (f["rank_err"] <= _SKQ_RANK_ERR)
        assert r["rank_err_le_10pct"] is True


def test_quantile_sparse_mode_exact_on_tiny_corpus(spark, tmp_path):
    # 5 docs with token counts 3..7: every shard holds < k=200 values, so
    # the KLL is in exact mode; the corpus row's estimate must be the true
    # discrete median (5) with midpoint rank exactly 0.5, and the exact
    # interpolated median must agree with DuckDB's quantile_cont
    texts = [" ".join(f"w{i}x{j}" for j in range(n)) for i, n in
             enumerate([3, 4, 5, 6, 7])]
    sf_dir = _write_docs(tmp_path, texts)
    from data_to_parquet_spark.operators.pipeline import (
        _shard_quantile_full,
    )

    rows = {
        r["shard_id"]: r for r in _shard_quantile_full(spark, sf_dir).collect()
    }
    corp = rows[-1]
    assert corp["n_docs"] == 5
    assert corp["exact_p50_tokens"] == 5.0
    assert corp["est_p50"] == 5
    assert corp["rank_err"] == 0.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = entry_mod.oracle_sql()["shard_quantile_rollup"]
    want = sorted(
        (r[0], r[1], r[2], bool(r[3])) for r in con.execute(oracle).fetchall()
    )
    con.close()
    from data_to_parquet_spark.operators.pipeline import shard_quantile_rollup

    got = sorted(
        (
            r["shard_id"],
            r["n_docs"],
            r["exact_p50_tokens"],
            r["rank_err_le_10pct"],
        )
        for r in shard_quantile_rollup(spark, sf_dir).collect()
    )
    assert got == want


def test_theta_overlap_exact_mode_and_envelope(spark, sf_dir):
    """At the default test scale every source vocabulary fits the theta
    sketch's 4096 nominal entries, so intersection estimates are EXACT;
    at any scale they must sit inside the 10% envelope the registered
    bucket claims."""
    from data_to_parquet_spark.operators.pipeline import (
        _THETA_INTER_ERR,
        _source_overlap_full,
    )

    rows = _source_overlap_full(spark, sf_dir).collect()
    n_sources = len({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        if r["vocab_a"] < 4096 and r["vocab_b"] < 4096:
            assert r["est_inter"] == r["exact_overlap"]  # exact mode
        if r["exact_overlap"]:
            assert (
                abs(r["est_inter"] - r["exact_overlap"]) / r["exact_overlap"]
                <= _THETA_INTER_ERR
            )
        else:
            assert r["est_inter"] == 0


def test_theta_overlap_disjoint_sources_matches_oracle(spark, tmp_path):
    # two sources with fully disjoint vocabularies: exact overlap 0,
    # theta intersection structurally 0, jaccard 0.0, bucket TRUE —
    # and Spark agrees with the DuckDB oracle row-for-row
    import pandas as pd

    texts = ["alpha beta gamma delta", "epsilon zeta eta theta"]
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": texts,
            "lang": ["en", "en"],
            "source": ["sA", "sB"],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from data_to_parquet_spark.operators.pipeline import (
        source_overlap_sketch_audit,
    )

    rows = source_overlap_sketch_audit(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("sA", "sB")
    assert (r["vocab_a"], r["vocab_b"]) == (2, 2)  # 4 tokens -> 2 shingles
    assert r["exact_overlap"] == 0
    assert r["exact_jaccard"] == 0.0
    assert r["inter_est_within_10pct"] is True
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    oracle = entry_mod.oracle_sql()["source_overlap_sketch_audit"]
    want = con.execute(oracle).fetchall()
    con.close()
    assert [
        (
            r["source_a"],
            r["source_b"],
            r["vocab_a"],
            r["vocab_b"],
            r["exact_overlap"],
            r["exact_jaccard"],
            r["inter_est_within_10pct"],
        )
    ] == [tuple(w[:6]) + (bool(w[6]),) for w in want]


def test_rollups_agree_with_manifest_on_shared_facts(spark, sf_dir):
    """Cross-operator consistency: the three shard-level publications
    (manifest, HLL rollup, KLL rollup) must agree on every fact they
    share — same shard partition, same per-shard doc counts."""
    from data_to_parquet_spark.operators.pipeline import (
        shard_quantile_rollup,
        shard_sketch_rollup,
        training_shard_manifest,
    )

    manifest = {
        r["shard_id"]: r["n_docs"]
        for r in training_shard_manifest(spark, sf_dir).collect()
    }
    hll = {
        r["shard_id"]: r["n_docs"]
        for r in shard_sketch_rollup(spark, sf_dir).collect()
        if r["shard_id"] >= 0
    }
    kll = {
        r["shard_id"]: r["n_docs"]
        for r in shard_quantile_rollup(spark, sf_dir).collect()
        if r["shard_id"] >= 0
    }
    assert hll == manifest
    assert kll == manifest


def test_overlap_audit_bounds_and_symmetry(spark, sf_dir, tmp_path_factory):
    """Structural invariants: overlap <= min vocab, jaccard in [0, 1],
    and the result is invariant to input row order."""
    import pandas as pd

    from data_to_parquet_spark.operators.pipeline import (
        source_overlap_sketch_audit,
    )

    rows = source_overlap_sketch_audit(spark, sf_dir).collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["exact_overlap"] <= min(r["vocab_a"], r["vocab_b"])
        assert 0.0 <= r["exact_jaccard"] <= 1.0
    base = sorted(
        (r["source_a"], r["source_b"], r["exact_overlap"], r["exact_jaccard"])
        for r in rows
    )
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    shuffled = tmp_path_factory.mktemp("overlap_shuffled")
    df.sample(frac=1.0, random_state=11).reset_index(drop=True).to_parquet(
        shuffled / "documents.parquet"
    )
    got = sorted(
        (r["source_a"], r["source_b"], r["exact_overlap"], r["exact_jaccard"])
        for r in source_overlap_sketch_audit(spark, str(shuffled)).collect()
    )
    assert got == base


def test_hll_corpus_vocab_consistent_with_overlap_audit(spark, sf_dir):
    """The HLL rollup's exact corpus vocabulary (shard_id = -1) and the
    overlap audit's per-source vocabularies describe the same shingle
    universe: inclusion-exclusion bounds must hold — the corpus distinct
    count can be at most the sum of per-source vocabularies and at least
    the largest single source."""
    from data_to_parquet_spark.operators.pipeline import (
        _shard_sketch_full,
        _source_overlap_full,
    )

    corpus_exact = {
        r["shard_id"]: r["exact_distinct_shingles"]
        for r in _shard_sketch_full(spark, sf_dir).collect()
    }[-1]
    per_source = {}
    for r in _source_overlap_full(spark, sf_dir).collect():
        per_source[r["source_a"]] = r["vocab_a"]
        per_source[r["source_b"]] = r["vocab_b"]
    assert max(per_source.values()) <= corpus_exact <= sum(per_source.values())
