"""Z-order (Morton) interleaving for multi-dimensional data clustering.

A single-column sorted layout (``sinks.parquet.to_sorted_parquet``) makes
min/max file statistics tight on ONE dimension; queries filtering the other
dimension still scan everything. Interleaving the bits of two keys into one
Morton code and range-partitioning + sorting on THAT gives every output file
a small rectangle in (x, y) space — so parquet zone maps prune on BOTH
dimensions. This is the layout trick behind Delta/Iceberg ``ZORDER BY`` /
``sort_order(z)``; here it is plain integer arithmetic over Spark built-ins,
fully whole-stage-codegen'd, and mirrored term-for-term in a DuckDB oracle.

The part that actually decides whether z-ordering works: both dimensions
must be scaled to the SAME bit width before interleaving. If x has 8
significant bits and y has 12, every high z-bit is a y-bit, a range split
on z slices only y, and the layout degenerates to a single-column sort
(verified as the negative control in tests/test_zorder_layout.py). Hence
``scale_to_bits``: map a value through its domain to ``2^bits`` equal cells
— the integer-arithmetic stand-in for the range-id sampling that Delta's
OPTIMIZE ZORDER performs. Everything here is exact integer math, so the
Spark and DuckDB formulations agree bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["scale_to_bits", "scale_to_bits_sql", "zorder_key", "zorder_key_sql"]


def scale_to_bits(v: Column, vmax: Column, bits: int) -> Column:
    """Scale ``v`` in [0, vmax] to an integer cell in [0, 2^bits):
    ``v * 2^bits // (vmax + 1)``. Monotonic (preserves locality, unlike a
    modulo fold) and total for nonnegative inputs.

    Exact-division shape: ``(a - a % b) / b`` — the numerator is divisible
    by b, so the double division is an exact integer (inputs stay < 2^53)
    and matches DuckDB's ``//`` bit-for-bit; a bare ``a / b`` float
    division could land an ulp under the true quotient and truncate to a
    different cell than the oracle."""
    a = v.cast("bigint") * (1 << bits)
    b = vmax.cast("bigint") + 1
    return ((a - a % b) / b).cast("bigint")


def scale_to_bits_sql(v: str, vmax: str, bits: int) -> str:
    return f"(CAST({v} AS BIGINT) * {1 << bits} // (CAST({vmax} AS BIGINT) + 1))"


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave two nonnegative ints (``bits`` low bits each) into
    a ``2*bits``-wide code: bit i of x lands at position 2i, bit i of y at
    2i+1. Pure integer arithmetic (``shiftright``/``&``/``shiftleft`` over
    BIGINT) — exact, deterministic, codegen-friendly; the term sum is
    folded into one projection expression."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The literal same interleave as DuckDB SQL (for oracles). Uses ``//``
    and ``%`` instead of bit operators so the expression is dialect-
    portable; on nonnegative ints both formulations are identical."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
