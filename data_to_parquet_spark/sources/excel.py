"""Excel → DataFrame source: the engine's replacement for the reference's
fixed pipeline (``src/lib.rs:30-65``), re-expressed Spark-first.

Design (SURVEY.md §3.3 "Spark lifecycle"):

* a file-list DataFrame (one row per input file) is repartitioned so each file
  becomes one Spark task — parallelism across files/executors replaces the
  reference's 8 hard-coded worker threads (``src/lib.rs:169,237``);
* inside each task, ``mapInPandas`` runs the stdlib streaming reader
  (:mod:`.xlsx` / :mod:`.xlsb`) and yields pandas chunks of ``batch_size``
  rows — Arrow carries them to the JVM as columnar batches, replacing the
  reference's hand-rolled RecordBatch pivot (``src/lib.rs:403-439``);
* the output schema is inferred on the driver from the FIRST file's header row
  using the exact reference naming rules (``build_headers``), and is all
  nullable strings (``src/lib.rs:229-234``).

Scale posture: at 100 TB (= millions of workbooks) the file list itself is a
DataFrame, schema inference touches only one file, and each task's memory is
bounded by one row + the shared-string table of its own file. No driver-side
materialization of data ever happens.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..errors import DataToParquetError
from ..kernels import build_headers
from .xlsx import XlsxWorkbook, _fast_path_eligible, walk_rows, walk_rows_fast

__all__ = [
    "read_excel",
    "read_excel_all_sheets",
    "scan_sheet",
    "open_workbook",
    "DEFAULT_BATCH_SIZE",
]

DEFAULT_BATCH_SIZE = 5000  # reference default: src/main.rs:31-32

# single .xlsx files whose sheet XML exceeds this are split across tasks
SPLIT_THRESHOLD_BYTES = 4 * 1024 * 1024


def open_workbook(path: str):
    """Extension dispatch (reference O3, ``src/main.rs:50-62``)."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext == "xlsx":
        return XlsxWorkbook(path)
    if ext == "xlsb":
        from .xlsb import XlsbWorkbook

        return XlsbWorkbook(path)
    raise DataToParquetError(
        f"Unsupported file extension: {ext!r} (expected xlsx or xlsb)"
    )


def _batch_to_pdf(batch: list[list[str | None]], cols: list[str]) -> pd.DataFrame:
    """Row-major batch -> pandas via C-level transpose. Positional columns
    (set_axis, not a dict) so duplicate header names — which the reference's
    naming rules can legitimately produce, e.g. ``a, a_2, a`` -> ``a, a_2,
    a_2`` — survive instead of collapsing."""
    n_cols = len(cols)
    columns = list(zip(*batch)) if batch else [[] for _ in range(n_cols)]
    pdf = pd.DataFrame(
        {i: pd.Series(c, dtype=object) for i, c in enumerate(columns)}
    )
    return pdf.set_axis(cols, axis=1)


def _sheet_geometry(wb, sheet: str, skip_rows: int):
    """(start_col, num_cols, header_row_idx) from the declared dimension box
    (``src/lib.rs:160-162``); None fields if the sheet lacks a dimension
    element (then geometry is inferred from the header row itself)."""
    dims = wb.dimensions(sheet)
    if dims is None:
        return None, None, None
    (r0, c0), (_, c1) = dims
    return c0, c1 - c0 + 1, r0 + skip_rows


def scan_sheet(
    wb,
    sheet: str,
    skip_rows: int = 0,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> tuple[list[str], Iterator[list[list[str | None]]]]:
    """Stream one sheet: returns (headers, iterator of row-batches).

    Reproduces the reference's scan semantics end to end:

    * rows before ``header_row_idx = start_row + skip_rows`` are discarded
      (``src/lib.rs:162,206-223``);
    * the header row is stringified and run through ``build_headers``
      (``src/lib.rs:441-465``);
    * data rows densify sparsely-present cells over the header's column span:
      absent cell → None (NULL), present-but-empty cell → ``""``
      (``src/lib.rs:398`` vs ``:428-433``);
    * cells beyond the header width are dropped (``src/lib.rs:424-425``);
    * batches carry ``batch_size`` rows (``src/main.rs:31-32``).
    """
    start_col, num_cols, header_row_idx = _sheet_geometry(wb, sheet, skip_rows)

    rows = wb.iter_rows_str(sheet)

    # --- header phase -----------------------------------------------------
    header_cells: dict[int, str] = {}
    first_row: int | None = None
    pending_row: tuple[int, list[tuple[int, str]]] | None = None
    for row, cells in rows:
        if first_row is None:
            first_row = row
            if header_row_idx is None:
                header_row_idx = first_row + skip_rows
        if row < header_row_idx:
            continue  # leading-row discard (O5)
        if row == header_row_idx:
            header_cells = dict(cells)
            continue
        pending_row = (row, cells)
        break

    if header_row_idx is None:  # empty sheet
        return [], iter(())

    if start_col is None:
        # no dimension element: infer span from the header row extent
        if not header_cells:
            return [], iter(())
        start_col = min(header_cells)
        num_cols = max(header_cells) - start_col + 1

    headers = build_headers(header_cells, num_cols, start_col)

    def batches() -> Iterator[list[list[str | None]]]:
        import itertools

        end_col = start_col + num_cols
        buf: list[list[str | None]] = []
        src = (
            itertools.chain([pending_row], rows)
            if pending_row is not None
            else rows
        )
        for _, cells in src:
            dense: list[str | None] = [None] * num_cols
            for col, s in cells:
                if start_col <= col < end_col:  # width truncation (O9)
                    dense[col - start_col] = s
            buf.append(dense)
            if len(buf) >= batch_size:
                yield buf
                buf = []
        if buf:
            yield buf

    return headers, batches()


def infer_schema(
    path: str,
    sheet_name: str | None = None,
    sheet_index: int | None = None,
    skip_rows: int = 0,
) -> T.StructType:
    """Driver-side schema inference: header row of one file only."""
    with open_workbook(path) as wb:
        sheet = wb.resolve_sheet(sheet_name, sheet_index)
        headers, _ = scan_sheet(wb, sheet, skip_rows, batch_size=1)
    if not headers:
        raise DataToParquetError(f"no header row found in {path!r}")
    return T.StructType(
        [T.StructField(h, T.StringType(), True) for h in headers]
    )


def read_excel(
    spark: SparkSession,
    paths: str | list[str],
    *,
    sheet_name: str | None = None,
    sheet_index: int | None = None,
    skip_rows: int = 0,
    batch_size: int = DEFAULT_BATCH_SIZE,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read one or many Excel workbooks into a DataFrame of nullable strings.

    Equivalent surface to the reference CLI/API options
    (``src/main.rs:7-33``): sheet selection by name/index/default, leading-row
    skip, batch size. Multi-file reads require a shared schema (taken from the
    first file), mirroring "one conversion = one schema". Passing ``schema``
    (all nullable strings, names = expected header row) skips the driver-side
    inference open — callers that already parsed the workbook (e.g.
    :func:`read_excel_all_sheets`) avoid re-opening it; executor tasks still
    validate each file's actual header row against it.
    """
    if isinstance(paths, str):
        paths = [paths]
    # expand globs / directories (a directory means every workbook in it)
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            expanded.extend(
                sorted(
                    glob.glob(os.path.join(p, "*.xlsx"))
                    + glob.glob(os.path.join(p, "*.xlsb"))
                )
            )
        elif any(ch in p for ch in "*?["):
            expanded.extend(sorted(glob.glob(p)))
        else:
            expanded.append(p)
    paths = expanded
    if not paths:
        raise DataToParquetError("no input paths")
    for p in paths:
        open_workbook(p).close()  # validate extensions + readability up front

    caller_schema = schema is not None
    if schema is None:
        schema = infer_schema(paths[0], sheet_name, sheet_index, skip_rows)
    n_cols = len(schema)
    out_names = schema.fieldNames()
    if len(set(out_names)) < n_cols:
        # The reference's naming rules can collide (`a, a_2, a` → a, a_2,
        # a_2). PySpark's pandas-result verification de-duplicates field
        # names through a set, so the mapInPandas leg must run with unique
        # internal names; the duplicates are restored afterwards via toDF.
        seen: dict[str, int] = {}
        unique = []
        for name in out_names:
            k = seen.get(name, 0)
            seen[name] = k + 1
            unique.append(name if k == 0 else f"{name}__dup{k}")
        schema = T.StructType(
            [T.StructField(u, T.StringType(), True) for u in unique]
        )

    def reader(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in iterator:
            for path in pdf["path"]:
                with open_workbook(path) as wb:
                    sheet = wb.resolve_sheet(sheet_name, sheet_index)
                    headers, batches = scan_sheet(
                        wb, sheet, skip_rows, batch_size
                    )
                    if headers != out_names:
                        raise DataToParquetError(
                            f"{path!r}: header row {headers} does not match "
                            f"the schema inferred from the first file "
                            f"{out_names}"
                        )
                    for batch in batches:
                        yield _batch_to_pdf(batch, cols)

    def _restore_names(df: DataFrame) -> DataFrame:
        return df if schema.fieldNames() == out_names else df.toDF(*out_names)

    if len(paths) == 1 and paths[0].lower().endswith(".xlsx"):
        split = _read_single_xlsx_split(
            spark,
            paths[0],
            schema,
            sheet_name,
            sheet_index,
            skip_rows,
            batch_size,
            # split fragments never see the header row, so a CALLER-passed
            # schema is validated against it inside the split's single
            # workbook open (the streaming `reader` checks per task;
            # without this a stale schema silently mislabels columns —
            # r9 review); the inferred-schema path needs no re-check
            expected_headers=out_names if caller_schema else None,
        )
        if split is not None:
            return _restore_names(split)

    # One slice per workbook via parallelize — an explicit-slices local
    # collection is already perfectly distributed, where the equivalent
    # createDataFrame(...).repartition(n) pays a full extra shuffle stage
    # (measured: 1.11 s -> 0.52 s for the 16-file fleet parse at the bench
    # fixture size). On a real cluster the file list is driver-side either
    # way; one task per file remains the unit of parallelism.
    files = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths], len(paths)),
        T.StructType([T.StructField("path", T.StringType())]),
    )
    return _restore_names(files.mapInPandas(reader, schema))


def read_excel_all_sheets(
    spark: SparkSession,
    path: str,
    *,
    skip_rows: int = 0,
    batch_size: int = DEFAULT_BATCH_SIZE,
    sheet_column: str = "_sheet",
) -> DataFrame:
    """Union every sheet of ONE workbook into a single DataFrame, each row
    tagged with its sheet name in ``sheet_column``.

    The reference resolves exactly one sheet per conversion
    (``src/lib.rs:105-124`` — ``get_sheet_name`` returns a single name and
    errors otherwise); this is the multi-sheet extension of that surface,
    the pandas ``sheet_name=None`` ergonomic. Each sheet is read through
    :func:`read_excel` with its OWN inferred header schema (the reference
    naming rules apply per sheet), then the frames are unioned by column
    NAME with ``allowMissingColumns=True`` so heterogeneous sheets surface
    NULL for the columns they lack — the same additive-evolution contract
    as the parquet mergeSchema path. Column order: first sheet's columns,
    then ``sheet_column``, then new columns in sheet order.

    Scale: each sheet is an independent :func:`read_excel` plan (single-
    file split parallelism included), and the union is a zero-shuffle
    plan-level concatenation — Spark unions are not exchanges. The
    workbook is parsed ONCE on the driver (sheet list + every header
    row); each per-sheet plan receives its schema instead of re-opening
    the file.

    Sheets whose header names collide after the reference dedup-suffix
    rules (the ``a, a_2, a`` edge read_excel supports positionally) are
    rejected — a BY-NAME union has no well-defined target for a
    duplicated name; and a sheet already containing ``sheet_column`` is
    rejected rather than silently overwritten.
    """
    with open_workbook(path) as wb:
        names = wb.sheet_names
        if not names:
            raise DataToParquetError(f"{path!r}: workbook has no sheets")
        headers = {
            name: scan_sheet(wb, name, skip_rows, batch_size=1)[0]
            for name in names
        }
    for name, hdr in headers.items():
        if not hdr:
            raise DataToParquetError(
                f"{path!r}: no header row found in sheet {name!r}"
            )
        if len(set(hdr)) < len(hdr):
            raise DataToParquetError(
                f"{path!r}: sheet {name!r} has duplicate header names "
                f"{hdr}; a by-name union is ambiguous — read it "
                f"positionally via read_excel(sheet_name={name!r})"
            )
        if sheet_column in hdr:
            raise DataToParquetError(
                f"{path!r}: sheet {name!r} already has a column named "
                f"{sheet_column!r}; pass a different sheet_column"
            )
    from pyspark.sql import functions as F

    out: DataFrame | None = None
    for name in names:
        part = read_excel(
            spark,
            path,
            sheet_name=name,
            skip_rows=skip_rows,
            batch_size=batch_size,
            schema=T.StructType(
                [
                    T.StructField(h, T.StringType(), True)
                    for h in headers[name]
                ]
            ),
        ).withColumn(sheet_column, F.lit(name))
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=True)
        )
    return out


def _read_single_xlsx_split(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sheet_name: str | None,
    sheet_index: int | None,
    skip_rows: int,
    batch_size: int,
    expected_headers: list[str] | None = None,
) -> DataFrame | None:
    """Parallelize ONE large .xlsx across tasks by splitting the sheet XML
    at ``<row`` boundaries.

    The deflate stream itself can't be range-read, so the driver inflates
    the sheet part once to a scratch file (bytes, no parsing — cheap), scans
    for row-start offsets with C-speed ``bytes.find``, and hands each task a
    byte range aligned on whole ``<row>`` elements. Tasks wrap their slice
    in a synthetic root and run the same ``walk_rows`` decoder (namespace-
    free fragments), so semantics are identical to the streaming path — the
    golden tests run through both.

    Returns None for small sheets (single-task streaming path is faster).
    """
    import tempfile

    # the scratch file lives on the driver's local disk — executors can only
    # read it in local mode (cluster mode would need a shared scratch FS)
    if not spark.sparkContext.master.startswith("local"):
        return None

    with XlsxWorkbook(path) as wb:
        sheet = wb.resolve_sheet(sheet_name, sheet_index)
        member = dict(wb._sheet_targets)[sheet]
        info = wb._zip.getinfo(member)
        if info.file_size < SPLIT_THRESHOLD_BYTES:
            return None
        dims = wb.dimensions(sheet)
        if dims is None:
            # no declared dimension box → geometry must be inferred from the
            # cell stream; only the streaming path implements that
            return None
        # split fragments index columns positionally and never see the
        # header row, so a CALLER-passed schema is validated here on the
        # already-open workbook (one header-row scan, no extra open —
        # the streaming path's per-task check has no split equivalent)
        if expected_headers is not None:
            actual, _ = scan_sheet(wb, sheet, skip_rows, batch_size=1)
            if actual != expected_headers:
                raise DataToParquetError(
                    f"{path!r}: header row {actual} does not match the "
                    f"provided schema {expected_headers}"
                )
        data = wb._zip.read(member)

    # fragments re-number r-less rows from 0, which would corrupt the
    # header-relative indexing — require explicit r attributes throughout
    # (every mainstream writer emits them; fall back to streaming otherwise)
    if data.count(b"<row ") != data.count(b"<row r="):
        return None

    # geometry + header row resolved driver-side (header text already went
    # into `schema` via infer_schema)
    start = data.find(b"<sheetData")
    end = data.rfind(b"</sheetData>")
    if start < 0 or end < 0:
        return None
    body_start = data.find(b"<row", start)
    if body_start < 0 or body_start > end:
        return None

    n_splits = max(1, min(spark.sparkContext.defaultParallelism, 64))
    approx = max(1, (end - body_start) // n_splits)
    offsets = [body_start]
    pos = body_start
    while True:
        nxt = data.find(b"<row", pos + approx)
        if nxt < 0 or nxt >= end:
            break
        offsets.append(nxt)
        pos = nxt
    offsets.append(end)

    scratch = tempfile.NamedTemporaryFile(
        prefix="d2p_sheet_", suffix=".xml", delete=False
    )
    scratch.write(data)
    scratch.close()
    scratch_path = scratch.name
    import atexit

    atexit.register(lambda: os.path.exists(scratch_path) and os.remove(scratch_path))
    # eligibility proved once driver-side over the WHOLE sheet buffer; every
    # fragment inherits it
    use_fast = _fast_path_eligible(data)
    del data

    (r0, c0), (_, c1) = dims  # dims presence checked above
    start_col, num_cols = c0, c1 - c0 + 1
    header_row_idx = r0 + skip_rows

    ranges = [
        (scratch_path, offsets[i], offsets[i + 1], i)
        for i in range(len(offsets) - 1)
    ]
    cols = [f.name for f in schema.fields]
    n_cols = len(cols)
    sst_source = path

    def frag_reader(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        sst: list[str] | None = None
        for pdf in iterator:
            for xml_path, lo, hi, _idx in pdf.itertuples(index=False):
                if sst is None:
                    with XlsxWorkbook(sst_source) as wb2:
                        sst = wb2._shared_strings()
                with open(xml_path, "rb") as f:
                    f.seek(lo)
                    frag = f.read(hi - lo)
                wrapped = b"<sheetData>" + frag + b"</sheetData>"
                end_col = start_col + num_cols
                buf: list[list[str | None]] = []
                rows_iter = (
                    walk_rows_fast(frag, sst)
                    if use_fast
                    else walk_rows(io.BytesIO(wrapped), "", sst)
                ) or walk_rows(io.BytesIO(wrapped), "", sst)
                for row, cells in rows_iter:
                    if row <= header_row_idx:
                        continue  # leading rows + header (driver-side)
                    dense: list[str | None] = [None] * num_cols
                    for col, s in cells:
                        if start_col <= col < end_col:
                            dense[col - start_col] = s
                    buf.append(dense)
                    if len(buf) >= batch_size:
                        yield _batch_to_pdf(buf, cols)
                        buf = []
                if buf:
                    yield _batch_to_pdf(buf, cols)

    rdf = spark.createDataFrame(
        ranges, "xml_path string, lo long, hi long, idx int"
    ).repartitionByRange(len(ranges), "idx")
    return rdf.mapInPandas(frag_reader, schema)
