"""Engine error types (API parity with the reference's Python wrapper).

The reference raises ``DataToParquetError`` from its Python layer
(``python_lib/src/data_to_parquet_bin/__init__.py:9-12``); we keep the same
exception name as the single user-facing error type.
"""

from __future__ import annotations

__all__ = ["DataToParquetError"]


class DataToParquetError(Exception):
    """Raised for any conversion failure (bad input, bad sheet, bad options)."""
