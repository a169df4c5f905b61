"""Pins for streaming_ivfpq_index_growth (streaming/windows.py): the
incremental IVF-PQ index build.

- The accumulated coded frame must equal the batch `_ivfpq_index_frame`
  output ROW FOR ROW (same cells, same residual codes, bit-identical
  norms) — the equality claim the driver oracle hash-checks as six
  COUNT(*) facts.
- The growth actually happened incrementally: multiple foreachBatch
  epochs, whose vec_id sets partition the corpus (no row indexed twice,
  none missed).
- The audit row itself: every fact equals the corpus size.
"""

from __future__ import annotations

from data_to_parquet_spark.streaming.windows import (
    _IVFPQ_STREAM_FILES,
    _ivfpq_stream_accumulate,
    streaming_ivfpq_index_growth,
)


def test_audit_row_all_facts_equal_corpus_size(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = streaming_ivfpq_index_growth(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r == {
        "n_vectors": n,
        "n_indexed": n,
        "n_distinct_vec": n,
        "n_match_batch": n,
        "n_cell_in_domain": n,
        "n_codes_valid": n,
    }


def test_epochs_partition_the_corpus(spark, sf_dir):
    acc = _ivfpq_stream_accumulate(spark, sf_dir)
    per_epoch = {
        r["epoch"]: r["n"]
        for r in acc.groupBy("epoch").count().withColumnRenamed("count", "n").collect()
    }
    # one epoch per arrival file, every one non-empty
    assert len(per_epoch) == _IVFPQ_STREAM_FILES
    assert all(n > 0 for n in per_epoch.values())
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(per_epoch.values()) == n
    # disjoint: distinct vec_ids across the union equals the total
    assert acc.select("vec_id").distinct().count() == n


def test_accumulated_equals_batch_build_row_for_row(spark, sf_dir):
    from data_to_parquet_spark.operators.similarity import (
        _ivfpq_index_frame,
    )

    def canon(df):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["codes"]), r["xnorm"])
            for r in df.collect()
        )

    got = canon(_ivfpq_stream_accumulate(spark, sf_dir).drop("epoch"))
    want = canon(_ivfpq_index_frame(spark, sf_dir))
    assert got == want  # bit-identical, including the float norms
