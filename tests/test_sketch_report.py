"""Pin for cardinality_sketch_report: the HLL++ estimate must stay within
the configured 2%-rsd sketch's practical error envelope (5%) of the exact
distinct count on every audited column."""

from __future__ import annotations

from data_to_parquet_spark.operators.relational import (
    cardinality_sketch_report,
)


def test_sketch_error_bounded(spark, sf_dir):
    rows = cardinality_sketch_report(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["exact"] > 0
        assert r["rel_error"] <= 0.05, (
            f"{r['col_name']}: HLL estimate {r['estimate']} vs exact "
            f"{r['exact']} — rel error {r['rel_error']:.4f} > 5%"
        )
