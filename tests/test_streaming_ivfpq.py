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

from pyspark.sql import functions as F

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


def test_streamed_index_serves_identical_topk(spark, sf_dir):
    """The serving proof behind streaming_ivfpq_index_serving: the ADC
    top-k search run against the streamed accumulator returns the SAME
    ranked neighbor list per query vector as the search against the
    batch index — ids, ranks, and bit-identical approx_cos."""
    from data_to_parquet_spark.operators.similarity import (
        _TOP_K,
        _ivfpq_index_frame,
        _ivfpq_search_frame,
    )
    from data_to_parquet_spark.streaming.windows import (
        streaming_ivfpq_index_serving,
    )

    def ranked(df):
        out: dict[int, list[tuple[int, int, float]]] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], []).append(
                (r["rank"], r["neighbor_id"], r["approx_cos"])
            )
        return {q: sorted(v) for q, v in out.items()}

    acc = _ivfpq_stream_accumulate(spark, sf_dir).drop("epoch")
    s = ranked(_ivfpq_search_frame(spark, sf_dir, acc))
    b = ranked(_ivfpq_search_frame(spark, sf_dir, _ivfpq_index_frame(spark, sf_dir)))
    assert s.keys() == b.keys() and len(s) > 0
    for q in s:
        assert s[q] == b[q]  # per-query top-k identical, cos bit-equal
        assert len(s[q]) <= _TOP_K

    # and the registered audit row states exactly that
    row = streaming_ivfpq_index_serving(spark, sf_dir).collect()[0].asDict()
    n_pairs = sum(len(v) for v in s.values())
    assert row == {
        "n_queries_served": len(s),
        "n_batch_pairs": n_pairs,
        "n_stream_pairs": n_pairs,
        "n_rank_agree": n_pairs,
    }


def test_manifest_growth_equals_batch_manifest(spark, sf_dir):
    """The associativity claim end-to-end: folding the per-epoch
    partials must reproduce the batch manifest column for column."""
    from data_to_parquet_spark.operators.pipeline import (
        training_shard_manifest,
    )
    from data_to_parquet_spark.streaming.windows import (
        streaming_shard_manifest_growth,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    got = canon(streaming_shard_manifest_growth(spark, sf_dir))
    want = canon(training_shard_manifest(spark, sf_dir))
    assert got == want


def test_manifest_partials_are_multi_epoch_and_bounded(spark, sf_dir):
    from data_to_parquet_spark.streaming.windows import (
        _IVFPQ_STREAM_FILES,
        _manifest_stream_accumulate,
    )

    acc = _manifest_stream_accumulate(spark, sf_dir)
    epochs = [r["epoch"] for r in acc.select("epoch").distinct().collect()]
    assert len(epochs) == _IVFPQ_STREAM_FILES
    # each partial is at most 16 rows (one per shard present in the batch)
    per_epoch = {
        r["epoch"]: r["count"] for r in acc.groupBy("epoch").count().collect()
    }
    assert all(1 <= n <= 16 for n in per_epoch.values())
    # doc counts across partials conserve the corpus
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert acc.groupBy().sum("n_docs").collect()[0][0] == n
    # range-partitioned arrival: epoch doc_id fences must not overlap,
    # so per-epoch min/max fences order consistently with epochs' ranges
    fences = sorted(
        (r["lo"], r["hi"])
        for r in acc.groupBy("epoch")
        .agg(
            F.min("min_doc_id").alias("lo"), F.max("max_doc_id").alias("hi")
        )
        .collect()
    )
    for (lo1, hi1), (lo2, _hi2) in zip(fences, fences[1:]):
        assert hi1 < lo2


def test_upsert_state_tie_rule_and_counts(spark, tmp_path):
    """The (ts, event_id) total order decides 'latest' — a same-ts pair
    resolves to the larger event_id; counts accumulate across epochs."""
    import datetime

    import pandas as pd

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        # user 1: later ts wins regardless of event_id order
        (10, t0, 1, "view", 1.5),
        (5, t0 + datetime.timedelta(minutes=9), 1, "purchase", 9.25),
        # user 2: tie ts -> larger event_id wins
        (20, t0, 2, "view", 2.0),
        (21, t0, 2, "click", 3.0),
        # user 3: single event
        (30, t0, 3, "view", 7.0),
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).assign(props="{}").to_parquet(tmp_path / "events.parquet")
    from data_to_parquet_spark.streaming.windows import (
        streaming_upsert_latest_state,
    )

    got = {
        r["user_id"]: r
        for r in streaming_upsert_latest_state(spark, str(tmp_path)).collect()
    }
    assert got[1]["last_event_id"] == 5
    assert got[1]["last_event_type"] == "purchase"
    assert got[1]["last_value"] == 9.25
    assert got[1]["n_events"] == 2
    assert got[2]["last_event_id"] == 21  # tie ts: larger event_id
    assert got[2]["n_events"] == 2
    assert got[3]["last_event_id"] == 30
    assert got[3]["n_events"] == 1


def test_upsert_state_folded_across_multiple_snapshots(spark, sf_dir):
    from data_to_parquet_spark.streaming.windows import (
        _IVFPQ_STREAM_FILES,
        _upsert_stream_state,
    )

    state, n_epochs = _upsert_stream_state(spark, sf_dir)
    assert n_epochs == _IVFPQ_STREAM_FILES  # the fold really ran 5 times
    # counts conserve the corpus
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert state.groupBy().sum("n_events").collect()[0][0] == n
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert state.count() == n_users


def test_delta_chain_fold_equals_every_epoch_rewrite(spark, sf_dir):
    """The compaction claim behind compact_upsert_snapshot: folding the
    never-combined per-epoch delta chain reproduces the every-epoch-
    rewrite policy's final snapshot exactly — same keys, same latest
    record (float payload bit-equal), same lifetime counts."""
    from data_to_parquet_spark.streaming.windows import (
        _IVFPQ_STREAM_FILES,
        _upsert_batch_fold,
        _upsert_delta_chain,
        _upsert_project,
        _upsert_stream_state,
    )

    deltas, n_epochs, _ = _upsert_delta_chain(spark, sf_dir)
    state, _ = _upsert_stream_state(spark, sf_dir)

    def canon(df):
        return sorted(tuple(r) for r in _upsert_project(df).collect())

    assert canon(_upsert_batch_fold(deltas)) == canon(state)

    # the chain is a real log: one delta per arrival epoch, counts
    # conserve the corpus, and (users recurring across epochs) the chain
    # holds at least as many rows as the folded snapshot
    assert n_epochs == _IVFPQ_STREAM_FILES
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert deltas.groupBy().sum("n_events").collect()[0][0] == n
    assert deltas.count() >= state.count()
    per_epoch = {
        r["epoch"]: r["count"]
        for r in deltas.groupBy("epoch").count().collect()
    }
    assert len(per_epoch) == _IVFPQ_STREAM_FILES
    assert all(c > 0 for c in per_epoch.values())


def test_cc_label_maintenance_equals_batch_clustering(spark, sf_dir):
    """streaming_cc_label_maintenance's claim: folding each epoch's new
    docs and pairs into the label table (contract -> tiny CC -> relabel)
    yields exactly the from-scratch batch clustering, including the
    label == min-member-doc_id invariant."""
    from data_to_parquet_spark.operators.dedup import (
        dedup_connected_components,
    )
    from data_to_parquet_spark.streaming.windows import (
        streaming_cc_label_maintenance,
    )

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in streaming_cc_label_maintenance(spark, sf_dir).collect()
    }
    want = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
    # the invariant the incremental merge must preserve: every cluster id
    # is the minimum doc_id of its members
    by_cluster: dict[int, list[int]] = {}
    for doc, c in got.items():
        by_cluster.setdefault(c, []).append(doc)
    assert all(c == min(m) for c, m in by_cluster.items())


def test_incremental_compaction_three_way_equality(spark, sf_dir):
    """compact_upsert_incremental's associativity claim: folding a
    materialized base snapshot with only the newer deltas equals the
    full-chain fold equals the every-epoch-rewrite snapshot."""
    from data_to_parquet_spark.streaming.windows import (
        _upsert_batch_fold,
        _upsert_delta_chain,
        _upsert_project,
        _upsert_stream_state,
        compact_upsert_incremental,
        compact_upsert_snapshot,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    inc = canon(compact_upsert_incremental(spark, sf_dir))
    full = canon(compact_upsert_snapshot(spark, sf_dir))
    deltas, _, _ = _upsert_delta_chain(spark, sf_dir)
    chain = canon(_upsert_project(_upsert_batch_fold(
        deltas.select("user_id", "s", "n_events")
    )))
    state, _ = _upsert_stream_state(spark, sf_dir)
    rewrite = canon(_upsert_project(state))
    assert inc == full == chain == rewrite
    assert len(inc) > 0
