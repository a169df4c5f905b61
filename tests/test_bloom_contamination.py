"""Pins for the bloom-filter decontamination path
(`contamination_bloom_flags`) against the exact broadcast-join variant
(`contamination_ngram_overlap`):

- NO FALSE NEGATIVES: per doc, every exactly-contaminated shingle is
  flagged (n_flagged >= n_contaminated, same doc set).
- bounded false positives: the corpus-wide over-flagging rate stays under
  0.1% of checked shingles at test scale (expected ≈ (set_bits/m)^k).
"""

from __future__ import annotations

from data_to_parquet_spark.operators.pipeline import (
    contamination_bloom_flags,
    contamination_ngram_overlap,
)


def test_bloom_superset_of_exact_and_fp_bounded(spark, sf_dir):
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_ngram_overlap(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"])
        for r in contamination_bloom_flags(spark, sf_dir).collect()
    }
    assert set(exact) == set(bloom)
    total_checked = 0
    total_false = 0
    for doc_id, (n_sh, n_exact) in exact.items():
        b_sh, n_flagged = bloom[doc_id]
        assert b_sh == n_sh, f"doc {doc_id}: shingle count mismatch"
        assert n_flagged >= n_exact, (
            f"doc {doc_id}: bloom missed a true contamination "
            f"({n_flagged} < {n_exact}) — bloom filters cannot have false "
            "negatives; the hash wiring is broken"
        )
        total_checked += n_sh
        total_false += n_flagged - n_exact
    assert total_false <= max(1, total_checked // 1000), (
        f"false-positive rate {total_false}/{total_checked} exceeds 0.1% — "
        "bitmap too small or bit arithmetic wrong"
    )
