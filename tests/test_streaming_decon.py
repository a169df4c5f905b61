"""Pins for `streaming_contamination_probe` (streaming/windows.py,
r14): the bloom deny-set audit maintained per arrival epoch must
compose to exactly the batch audit — the streamed-equals-batch
contract the shared `_BLOOM_AUDIT_ORACLE` encodes — and the stream
must actually have been multi-epoch for that equality to mean
anything.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_to_parquet_spark.operators.pipeline import (
    contamination_bloom_audit,
)
from data_to_parquet_spark.streaming.windows import (
    _IVFPQ_STREAM_FILES,
    _decon_stream_partials,
    streaming_contamination_probe,
)


def test_streamed_equals_batch_audit(spark, sf_dir):
    streamed = streaming_contamination_probe(spark, sf_dir).collect()
    batch = contamination_bloom_audit(spark, sf_dir).collect()
    assert len(streamed) == len(batch) == 1
    assert streamed[0].asDict() == batch[0].asDict()


def test_multiple_epochs_actually_happened(spark, sf_dir):
    acc = _decon_stream_partials(spark, sf_dir)
    epochs = [r["epoch"] for r in acc.select("epoch").distinct().collect()]
    assert len(epochs) == _IVFPQ_STREAM_FILES
    # every epoch contributed probes (the corpus is range-partitioned
    # on doc_id, so no batch is empty at any shipped sf)
    assert acc.filter(F.col("n_probes") <= 0).count() == 0


def test_partials_fold_matches_their_own_sum(spark, sf_dir):
    """The fold is a plain sum — the partials must carry it: summed
    false negatives are zero (one-sided error holds in EVERY epoch,
    not just in aggregate) and contaminated probes never exceed
    probes."""
    acc = _decon_stream_partials(spark, sf_dir)
    rows = acc.collect()
    assert sum(r["n_fn"] for r in rows) == 0
    assert all(0 <= r["n_cont"] <= r["n_probes"] for r in rows)
    streamed = streaming_contamination_probe(spark, sf_dir).collect()[0]
    assert streamed["n_probes"] == sum(r["n_probes"] for r in rows)
    assert streamed["n_contaminated_probes"] == sum(
        r["n_cont"] for r in rows
    )
