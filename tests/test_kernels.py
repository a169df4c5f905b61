"""Unit tests for the pure-Python parity kernels (SURVEY.md §5 checklist)."""

from __future__ import annotations

import math

from hypothesis import given
from hypothesis import strategies as st

from data_to_parquet_spark.kernels import (
    CellValue,
    build_headers,
    cell_to_string,
    format_float,
)


class TestBuildHeaders:
    def test_happy_path(self):
        assert build_headers({0: "a", 1: "b"}, 2, 0) == ["a", "b"]

    def test_fixture_f2_hostile_headers(self):
        # FIXTURES.md F2: ["", "x", "x", "x", "", "y"] ->
        # [Field_0, x, x_2, x_3, Field_4, y]
        cells = {1: "x", 2: "x", 3: "x", 5: "y"}
        assert build_headers(cells, 6, 0) == [
            "Field_0",
            "x",
            "x_2",
            "x_3",
            "Field_4",
            "y",
        ]

    def test_empty_string_cells_also_fallback(self):
        assert build_headers({0: "", 1: "b"}, 2, 0) == ["Field_0", "b"]

    def test_nonzero_start_col_uses_relative_index(self):
        # Field_{i} uses the 0-based relative position, not absolute column
        assert build_headers({3: "a"}, 3, 2) == ["Field_0", "a", "Field_2"]

    def test_first_occurrence_keeps_bare_name(self):
        assert build_headers({0: "x", 1: "x"}, 2, 0) == ["x", "x_2"]

    def test_all_empty(self):
        assert build_headers({}, 3, 0) == ["Field_0", "Field_1", "Field_2"]


class TestFormatFloat:
    def test_simple(self):
        assert format_float(1.5) == "1.5"
        assert format_float(0.1 + 0.2) == "0.30000000000000004"

    def test_integral_floats_drop_point(self):
        # Rust Display: format!("{}", 1.0f64) == "1"
        assert format_float(1.0) == "1"
        assert format_float(-3.0) == "-3"

    def test_no_exponent_notation(self):
        assert format_float(1e20) == "100000000000000000000"
        assert format_float(1e-5) == "0.00001"
        assert format_float(4.2e-7) == "0.00000042"

    def test_specials(self):
        assert format_float(float("nan")) == "NaN"
        assert format_float(float("inf")) == "inf"
        assert format_float(float("-inf")) == "-inf"

    @given(st.floats(allow_nan=False, allow_infinity=False))
    def test_roundtrip(self, x):
        s = format_float(x)
        assert "e" not in s and "E" not in s
        assert float(s) == x  # shortest-roundtrip property


class TestCellToString:
    def test_arms(self):
        assert cell_to_string(CellValue("int", 42)) == "42"
        assert cell_to_string(CellValue("float", 1.5)) == "1.5"
        assert cell_to_string(CellValue("string", "héllo")) == "héllo"
        assert cell_to_string(CellValue("bool", True)) == "true"
        assert cell_to_string(CellValue("bool", False)) == "false"
        assert cell_to_string(CellValue("error", "#DIV/0!")) == "Div0"
        assert cell_to_string(CellValue("error", "#N/A")) == "NA"
        assert cell_to_string(CellValue("empty", None)) == ""
        assert (
            cell_to_string(CellValue("iso", "2024-01-15T10:30:00"))
            == "2024-01-15T10:30:00"
        )
