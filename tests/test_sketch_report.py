"""Pin for cardinality_sketch_report: the HLL++ estimate must stay within
the configured 2%-rsd sketch's practical error envelope (5%) of the exact
distinct count on every audited column. Since round 9 the registered query
emits the BUCKET (error_le_5pct) instead of the raw estimate so the driver
oracle can hash-check it; the raw-estimate bound is pinned here on the
internal full frame, and the bucket must agree with it."""

from __future__ import annotations

from data_to_parquet_spark.operators.relational import (
    _sketch_report_full,
    cardinality_sketch_report,
)


def test_sketch_error_bounded(spark, sf_dir):
    rows = _sketch_report_full(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["exact"] > 0
        assert r["rel_error"] <= 0.05, (
            f"{r['col_name']}: HLL estimate {r['estimate']} vs exact "
            f"{r['exact']} — rel error {r['rel_error']:.4f} > 5%"
        )


def test_bucketed_query_agrees_with_full_frame(spark, sf_dir):
    full = {r["col_name"]: r for r in _sketch_report_full(spark, sf_dir).collect()}
    bucketed = cardinality_sketch_report(spark, sf_dir).collect()
    assert len(bucketed) == 4
    for r in bucketed:
        f = full[r["col_name"]]
        assert r["exact"] == f["exact"]
        assert r["error_le_5pct"] == (f["rel_error"] <= 0.05)
        # the oracle carries TRUE as the pre-verified literal, so a
        # false bucket here means the driver hash would go red — this
        # assert is the early warning
        assert r["error_le_5pct"] is True


def test_quantile_rank_error_is_tie_robust(spark, tmp_path):
    """r9 ADVICE: a heavily-tied column must not flip the rank-error
    bucket when the sketch is perfect. 60% of one group's rows share the
    true median value — an at-or-below rank counts the whole tie mass
    (0.8, bucket FALSE despite a perfect sketch); the midpoint-of-tie-run
    rank (strictly-less + half the ties) reads 0.5 and keeps it TRUE."""
    from data_to_parquet_spark.operators.relational import (
        quantile_sketch_report,
    )

    rows = (
        [("A", 1.0)] * 20 + [("A", 5.0)] * 60 + [("A", 9.0)] * 20
    )
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = quantile_sketch_report(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_p50"] == 5.0
    assert r["rank_err_le_1pct"] is True
