"""``spark.read.format("excel")`` — the engine's Excel scan surfaced as a
PySpark 4 Python DataSource (V2 API).

This is the idiomatic Spark face of the reference's converter pipeline
(``src/lib.rs:30-65``): the same stdlib streaming readers and header/
stringify kernels as :func:`..sources.excel.read_excel`, but registered as a
named format so Excel participates in the normal reader surface::

    spark.dataSource.register(ExcelDataSource)
    df = (spark.read.format("excel")
          .option("sheet_name", "Data")
          .option("skip_rows", "1")
          .load("/data/books/*.xlsx"))

Execution model: ``partitions()`` returns one :class:`InputPartition` per
workbook (the same one-task-per-file parallelism the mapInPandas path uses —
replacing the reference's 8 hard-coded threads, ``src/lib.rs:169,237``), and
``read()`` yields Arrow RecordBatches straight from the streaming scan, so
rows never materialize driver-side and per-task memory stays bounded by one
batch.

Differences from :func:`read_excel` (documented deviations):

* duplicate output column names (the reference's ``a, a_2, a`` collision,
  ``src/lib.rs:455-463``) are uniquified with ``__dupN`` suffixes — a named
  format cannot rename columns after the fact the way the mapInPandas path's
  ``toDF`` restore does;
* the single-large-file XML-split fast path is not applied (a DataSource
  partition maps to a whole file); use ``read_excel`` to parallelize inside
  one giant workbook.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..errors import DataToParquetError
from .excel import DEFAULT_BATCH_SIZE, open_workbook, scan_sheet

__all__ = ["ExcelDataSource", "register"]


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        found = sorted(
            glob.glob(os.path.join(path, "*.xlsx"))
            + glob.glob(os.path.join(path, "*.xlsb"))
        )
    elif any(ch in path for ch in "*?["):
        found = sorted(glob.glob(path))
    else:
        found = [path]
    if not found:
        raise DataToParquetError(f"no Excel files match {path!r}")
    return found


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _uniquify(headers: list[str]) -> list[str]:
    """Residual-collision guard over build_headers output (``a, a_2, a``
    still collides after the reference's ``_n`` suffixing)."""
    seen: dict[str, int] = {}
    unique = []
    for h in headers:
        k = seen.get(h, 0)
        seen[h] = k + 1
        unique.append(h if k == 0 else f"{h}__dup{k}")
    return unique


class ExcelDataSource(DataSource):
    """Excel workbooks (.xlsx/.xlsb) as a named Spark read format."""

    @classmethod
    def name(cls) -> str:
        return "excel"

    def _opts(self):
        o = self.options
        sheet_index = o.get("sheet_index")
        return (
            o.get("sheet_name"),
            int(sheet_index) if sheet_index is not None else None,
            int(o.get("skip_rows", 0)),
            int(o.get("batch_size", DEFAULT_BATCH_SIZE)),
        )

    def _files(self) -> list[str]:
        path = self.options.get("path")
        if not path:
            raise DataToParquetError("format('excel') requires .load(path)")
        return _expand(path)

    def schema(self) -> T.StructType:
        sheet_name, sheet_index, skip_rows, _ = self._opts()
        with open_workbook(self._files()[0]) as wb:
            sheet = wb.resolve_sheet(sheet_name, sheet_index)
            headers, _ = scan_sheet(wb, sheet, skip_rows, batch_size=1)
        if not headers:
            raise DataToParquetError("no header row found")
        return T.StructType(
            [
                T.StructField(u, T.StringType(), True)
                for u in _uniquify(headers)
            ]
        )

    def reader(self, schema: T.StructType) -> "ExcelReader":
        return ExcelReader(self._files(), schema, *self._opts())

    def streamReader(self, schema: T.StructType) -> "ExcelStreamReader":
        path = self.options.get("path")
        if not path:
            raise DataToParquetError("format('excel') requires .load(path)")
        return ExcelStreamReader(path, schema, *self._opts())


class ExcelReader(DataSourceReader):
    def __init__(self, files, schema, sheet_name, sheet_index, skip_rows, batch_size):
        self.files = files
        self.field_names = schema.fieldNames()
        self.sheet_name = sheet_name
        self.sheet_index = sheet_index
        self.skip_rows = skip_rows
        self.batch_size = batch_size

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition):
        import pyarrow as pa

        with open_workbook(partition.path) as wb:
            sheet = wb.resolve_sheet(self.sheet_name, self.sheet_index)
            headers, batches = scan_sheet(
                wb, sheet, self.skip_rows, self.batch_size
            )
            if _uniquify(headers) != self.field_names:
                raise DataToParquetError(
                    f"{partition.path!r}: header row {headers!r} does not "
                    f"match the schema inferred from the first file "
                    f"({self.field_names!r}) — same-position columns would "
                    f"be silently remapped"
                )
            for batch in batches:
                # columns are positional (reference O9 densify semantics);
                # one Arrow array per schema column, nulls for absent cells
                arrays = [
                    pa.array([row[i] for row in batch], type=pa.string())
                    for i in range(len(self.field_names))
                ]
                yield pa.RecordBatch.from_arrays(arrays, self.field_names)


class ExcelStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("excel")`` — continuous workbook ingestion.

    Offset model: the offset IS the seen-files ledger ``{path: mtime_ns}``
    (the same design as Spark's built-in FileStreamSource): ``latestOffset``
    merges the current directory listing into the ledger, and a micro-batch
    processes exactly the paths present in ``end`` but not in ``start`` —
    one InputPartition (= one task) per new file. Because membership is by
    path (not by an mtime watermark), a file landing with an old or tied
    modification time is still picked up exactly once, and a transiently
    empty listing (unmounted share, slow NFS) cannot regress the offset and
    re-ingest history. Exactly-once is keyed by path: a file REWRITTEN in
    place is NOT ingested again — append-only landing zones are the
    intended layout (mtimes are recorded for observability only).

    The ledger grows with the total file count, exactly like
    FileStreamSource's seen-files map (bounded there only by the optional
    maxFileAge); directory retention/compaction is the operator's job.
    The schema is inferred at stream start, so at least one workbook must
    exist (or pass an explicit schema).
    """

    def __init__(self, path, schema, sheet_name, sheet_index, skip_rows, batch_size):
        self.path = path
        self.field_names = schema.fieldNames()
        self.sheet_name = sheet_name
        self.sheet_index = sheet_index
        self.skip_rows = skip_rows
        self.batch_size = batch_size

    def _listing(self) -> dict[str, int]:
        try:
            files = _expand(self.path)
        except DataToParquetError:
            return {}
        out: dict[str, int] = {}
        for p in files:
            try:
                out[p] = os.stat(p).st_mtime_ns
            except OSError:
                continue  # deleted between listing and stat
        return out

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def latestOffset(self) -> dict:
        # monotone: the new ledger is a superset of the last one this
        # instance produced, so an empty/failed listing never shrinks it
        seen = dict(getattr(self, "_seen", {}))
        seen.update(
            {p: mt for p, mt in self._listing().items() if p not in seen}
        )
        self._seen = seen
        return {"seen": seen}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["seen"]) - set(start["seen"]))
        return [_FilePartition(p) for p in new]

    def read(self, partition: _FilePartition):
        reader = ExcelReader(
            [partition.path],
            T.StructType(
                [T.StructField(n, T.StringType(), True) for n in self.field_names]
            ),
            self.sheet_name,
            self.sheet_index,
            self.skip_rows,
            self.batch_size,
        )
        yield from reader.read(partition)

    def commit(self, end: dict) -> None:
        pass  # the checkpoint log is the ledger; nothing engine-side to GC


def register(spark) -> None:
    """Idempotently register the 'excel' format on a SparkSession."""
    spark.dataSource.register(ExcelDataSource)
