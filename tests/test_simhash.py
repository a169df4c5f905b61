"""SimHash band-scheme guarantee: with 4 disjoint 16-bit bands, every pair
at Hamming distance ≤ 3 shares at least one exact band (pigeonhole), so the
banded candidate join must find EXACTLY the brute-force Hamming-≤3 pairs —
recall and precision both 100% against an all-pairs scan of the same
fingerprints.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_to_parquet_spark.operators.base import load_table
from data_to_parquet_spark.operators.dedup import (
    _SIMHASH_HAMMING,
    dedup_simhash_pairs,
    simhash_fingerprints,
)


def test_simhash_matches_bruteforce_hamming(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(d)
    a = fp.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a")
    )
    b = fp.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b")
    )
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= _SIMHASH_HAMMING)
    )
    expected = {
        (r.doc_a, r.doc_b, r.hamming) for r in brute.collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash_pairs(spark, sf_dir).collect()
    }
    assert got == expected
    # the banded join found every brute-force pair (recall guarantee) —
    # make sure the assertion isn't vacuous on corpora with no close pairs
    assert all(h <= _SIMHASH_HAMMING for (_, _, h) in got)
