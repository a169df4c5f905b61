"""Semantics pins for the round-10 int8 quantization audit, on a
hand-built corpus where the expected behavior is derivable: a constant
dimension must dequantize exactly (error 0 on that dim), per-element
error is bounded by half a quantization step, and grid-point values
round-trip exactly. Cross-engine values are checked by
tests/test_oracle_parity.py::embedding_int8_quantize_audit."""

from __future__ import annotations

from data_to_parquet_spark.operators.similarity import (
    embedding_int8_quantize_audit,
)


def test_quantize_audit_bounds_and_constant_dim(spark, tmp_path):
    # dim 0: spans [0, 255] -> scale 1.0, integer values sit ON the grid
    # dim 1: constant 0.25 -> scale 0, must dequantize to exactly 0.25
    # dim 2: spans [-1, 1] -> scale 2/255, errors bounded by scale/2
    rows = [
        (0, [0.0, 0.25, -1.0]),
        (1, [100.0, 0.25, 0.3]),
        (2, [255.0, 0.25, 1.0]),
        (3, [7.0, 0.25, -0.123]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r["vec_id"]: r
        for r in embedding_int8_quantize_audit(spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    half_step = (2.0 / 255.0) / 2.0  # widest non-grid dim (dim 2)
    for r in out.values():
        assert r["max_abs_err"] <= half_step + 1e-9
        assert 0.0 <= r["mse"] <= half_step**2
        assert r["cos_dequant"] is not None
    # vectors 0 and 2 are exactly on every dim's grid (grid endpoints on
    # dims 0/2, the constant on dim 1): bit-exact round-trip
    # float32 storage of 0.3/-0.123 keeps vectors 1/3 OFF the dim-2 grid
    assert out[0]["max_abs_err"] == 0.0
    assert out[2]["max_abs_err"] == 0.0
    assert out[0]["cos_dequant"] == 1.0
    assert out[1]["max_abs_err"] > 0.0
