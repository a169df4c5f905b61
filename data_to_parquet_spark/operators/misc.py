"""Reference-parity surface exposed through the driver contract.

``excel_roundtrip`` exercises the full reference pipeline (O1, O3-O9, O12
semantics) as a driver-checkable query: synthesize a deterministic workbook,
convert it through the engine, read the parquet back. Rows-only check (the
input is a generated Excel file, not one of the oracle's parquet views); the
pytest suite covers golden-value parity for the same path.
"""

from __future__ import annotations

import os
import tempfile

from ..sinks.parquet import to_single_parquet_file
from ..sources.excel import read_excel
from .base import Registry

MISC = Registry()


def _make_fixture(path: str) -> None:
    # deterministic workbook: 100 rows, every cell-type arm
    import sys

    sys.path.insert(0, "/root/repo")  # tests package hosts the stdlib writer
    from tests.xlsx_fixture import write_xlsx

    rows = [["id", "amount", "name", "active", "when_iso", "err"]]
    for i in range(100):
        rows.append(
            [
                i,
                i * 1.5,
                f"name_{i}",
                i % 2 == 0,
                ("iso", f"2024-01-{(i % 28) + 1:02d}T10:30:00"),
                ("error", "#DIV/0!") if i % 10 == 0 else f"ok{i}",
            ]
        )
    write_xlsx(path, {"Data": rows})


@MISC.register("excel_roundtrip", oracle=None)
def excel_roundtrip(spark, sf_dir):
    """Excel → DataFrame → single ZSTD parquet → read back (full O1-O12 path)."""
    tmp = tempfile.mkdtemp(prefix="d2p_roundtrip_")
    src = os.path.join(tmp, "fixture.xlsx")
    out = os.path.join(tmp, "fixture.parquet")
    _make_fixture(src)
    df = read_excel(spark, src, sheet_name="Data")
    to_single_parquet_file(df, out)
    return spark.read.parquet(out)
