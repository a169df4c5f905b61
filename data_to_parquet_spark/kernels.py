"""Pure-Python kernels replicating the reference's schema/stringify semantics.

These are the highest-fidelity-risk pieces of the port surface (SURVEY.md §7.3 M1):

* ``build_headers`` — header-row → column names with positional densification,
  ``Field_{i}`` fallback for empty names and ``_{n}`` suffixing for duplicates
  (reference: ``src/lib.rs:441-465``).
* ``format_float`` / ``format_int`` — Rust ``Display``-compatible number
  stringification (reference: ``src/lib.rs:389-390``). Rust's f64 ``Display``
  prints the shortest roundtrip decimal WITHOUT exponent notation; Python's
  ``repr(float)`` switches to exponent form outside ``1e-4..1e16``, so we
  re-expand via ``decimal``.
* ``cell_to_string`` — normalization of every source cell type to UTF-8 string
  (reference: ``cell_to_string`` at ``src/lib.rs:387-400``), including lowercase
  booleans and Excel error-token debug formatting.

No Spark imports here: these run inside executor-side readers and in unit tests.
"""

from __future__ import annotations

import math
from decimal import Decimal
from typing import Mapping

__all__ = [
    "build_headers",
    "format_float",
    "format_int",
    "cell_to_string",
    "excel_error_token",
    "CellValue",
]


def build_headers(
    cells: Mapping[int, str], num_cols: int, start_col: int
) -> list[str]:
    """Build output column names from one header row.

    ``cells`` maps absolute column index -> raw header text for the cells that
    were physically present in the header row. Semantics (reference
    ``src/lib.rs:441-465``):

    1. densify positionally over ``start_col .. start_col + num_cols - 1``;
    2. empty (or absent) header cell at relative position ``i`` -> ``Field_{i}``
       (0-based relative index);
    3. duplicate names: the first occurrence keeps the bare name, the n-th
       occurrence (n >= 2) becomes ``{name}_{n}``.
    """
    raw: list[str] = []
    for i in range(num_cols):
        value = cells.get(start_col + i, "")
        raw.append(value if value != "" else f"Field_{i}")

    seen: dict[str, int] = {}
    out: list[str] = []
    for name in raw:
        count = seen.get(name, 0) + 1
        seen[name] = count
        out.append(name if count == 1 else f"{name}_{count}")
    return out


def format_int(value: int) -> str:
    """Rust ``i64::to_string`` equivalent (``src/lib.rs:389``)."""
    return str(value)


def format_float(value: float) -> str:
    """Rust ``f64`` ``Display`` equivalent (``src/lib.rs:390``).

    Shortest roundtrip decimal, never exponent notation; ``NaN`` / ``inf`` /
    ``-inf`` spelled as Rust does.
    """
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "inf" if value > 0 else "-inf"
    s = repr(value)  # shortest roundtrip, may use exponent form
    if "e" in s or "E" in s:
        # Expand to positional notation, preserving the shortest-roundtrip
        # digits (Decimal(repr) keeps exactly those digits).
        s = format(Decimal(s), "f")
    # Rust prints integral floats as "1" via Display?  No: Rust Display for
    # f64 prints `1` as "1" only with `{}`?  `format!("{}", 1.0_f64)` == "1".
    # Python repr(1.0) == "1.0" — strip the trailing ".0" to match.
    if s.endswith(".0"):
        s = s[:-2]
    return s


# Excel error literal -> calamine `CellErrorType` Debug token
# (reference: `{:?}` formatting at src/lib.rs:397; variants are public
# calamine API: Div0, NA, Name, Null, Num, Ref, Value, GettingData).
_ERROR_TOKENS = {
    "#DIV/0!": "Div0",
    "#N/A": "NA",
    "#NAME?": "Name",
    "#NULL!": "Null",
    "#NUM!": "Num",
    "#REF!": "Ref",
    "#VALUE!": "Value",
    "#GETTING_DATA": "GettingData",
}


def excel_error_token(literal: str) -> str:
    """Map an Excel error literal (as stored in the file) to its token."""
    return _ERROR_TOKENS.get(literal, literal)


class CellValue:
    """Tagged source-cell value, pre-normalization.

    ``kind`` is one of: ``int float string bool error empty iso``.
    ``iso`` covers DateTimeIso / DurationIso cells (stored ISO-8601 text,
    emitted as-is — reference ``src/lib.rs:395-396``).

    Date-*styled* numeric cells need no kind of their own: the reference's
    calamine 0.32 is built without the chrono-backed ``dates`` feature
    (Cargo.toml lists none), so ``DataRef::DateTime`` Display prints the raw
    serial f64 (``src/lib.rs:394``) — identical to the plain ``float`` path.
    """

    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value) -> None:
        self.kind = kind
        self.value = value

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"CellValue({self.kind!r}, {self.value!r})"


def cell_to_string(cell: CellValue) -> str:
    """Normalize a source cell to its output string (``src/lib.rs:387-400``)."""
    k = cell.kind
    if k == "int":
        return format_int(cell.value)
    if k == "float":
        return format_float(cell.value)
    if k == "string" or k == "iso":
        return cell.value
    if k == "bool":
        return "true" if cell.value else "false"
    if k == "error":
        return excel_error_token(cell.value)
    if k == "empty":
        return ""
    raise ValueError(f"unknown cell kind: {k!r}")
