"""Minimal .xlsb writer for test fixtures (stdlib only — pyxlsb is read-only
and absent anyway). Emits the [MS-XLSB] binary records the reader consumes:
BrtBundleSh sheet directory, BrtSSTItem shared strings, BrtWsDim, BrtRowHdr
and the cell records. Same cell-spec convention as :mod:`.xlsx_fixture`,
plus ``("rk_int", n)`` / ``("rk_x100", f)`` to exercise RkNumber decoding.
"""

from __future__ import annotations

import struct
import zipfile

from data_to_parquet_spark.sources.xlsb import (
    BRT_BUNDLE_SH,
    BRT_CELL_BLANK,
    BRT_CELL_BOOL,
    BRT_CELL_ERROR,
    BRT_CELL_ISST,
    BRT_CELL_REAL,
    BRT_CELL_RK,
    BRT_CELL_ST,
    BRT_ROW_HDR,
    BRT_WS_DIM,
    BRT_SST_ITEM,
)

_ERR_CODES = {
    "#NULL!": 0x00,
    "#DIV/0!": 0x07,
    "#VALUE!": 0x0F,
    "#REF!": 0x17,
    "#NAME?": 0x1D,
    "#NUM!": 0x24,
    "#N/A": 0x2A,
    "#GETTING_DATA": 0x2B,
}


def _record(rid: int, payload: bytes) -> bytes:
    # record id: 7 bits per byte, high bit = "another id byte follows"
    if rid < 0x80:
        head = bytes([rid])
    else:
        head = bytes([(rid & 0x7F) | 0x80, (rid >> 7) & 0x7F])
    # length varint
    ln = len(payload)
    out = bytearray(head)
    while True:
        b = ln & 0x7F
        ln >>= 7
        out.append(b | (0x80 if ln else 0))
        if not ln:
            break
    return bytes(out) + payload


def _wide(s: str) -> bytes:
    enc = s.encode("utf-16-le")
    return struct.pack("<I", len(enc) // 2) + enc


def _cell_hdr(col: int) -> bytes:
    return struct.pack("<I", col) + b"\x00\x00\x00\x00"  # style 0, no flags


def write_xlsb(path: str, sheets: dict[str, list[list]]) -> str:
    sst: list[str] = []
    sst_idx: dict[str, int] = {}

    def sst_id(s: str) -> int:
        if s not in sst_idx:
            sst_idx[s] = len(sst)
            sst.append(s)
        return sst_idx[s]

    def cell_bytes(col: int, spec) -> bytes | None:
        hdr = _cell_hdr(col)
        if spec is None:
            return None
        if isinstance(spec, tuple):
            kind = spec[0]
            if kind == "empty":
                return _record(BRT_CELL_BLANK, hdr)
            if kind == "error":
                return _record(
                    BRT_CELL_ERROR, hdr + bytes([_ERR_CODES[spec[1]]])
                )
            if kind == "rk_int":
                raw = ((spec[1] << 2) & 0xFFFFFFFF) | 0x2
                return _record(BRT_CELL_RK, hdr + struct.pack("<I", raw))
            if kind == "rk_x100":
                # store value*100 as the int form with the ÷100 flag
                raw = ((int(spec[1] * 100) << 2) & 0xFFFFFFFF) | 0x3
                return _record(BRT_CELL_RK, hdr + struct.pack("<I", raw))
            raise ValueError(f"bad xlsb cell spec {spec!r}")
        if isinstance(spec, bool):
            return _record(BRT_CELL_BOOL, hdr + bytes([1 if spec else 0]))
        if isinstance(spec, int):
            if -(1 << 29) <= spec < (1 << 29):
                raw = ((spec << 2) & 0xFFFFFFFF) | 0x2
                return _record(BRT_CELL_RK, hdr + struct.pack("<I", raw))
            return _record(
                BRT_CELL_REAL, hdr + struct.pack("<d", float(spec))
            )
        if isinstance(spec, float):
            return _record(BRT_CELL_REAL, hdr + struct.pack("<d", spec))
        if isinstance(spec, str):
            return _record(
                BRT_CELL_ISST, hdr + struct.pack("<I", sst_id(spec))
            )
        raise ValueError(f"bad xlsb cell spec {spec!r}")

    sheet_blobs: list[bytes] = []
    for rows in sheets.values():
        body = bytearray()
        max_w = max((len(r) for r in rows), default=1)
        body += _record(
            BRT_WS_DIM,
            struct.pack("<IIII", 0, max(len(rows) - 1, 0), 0, max_w - 1),
        )
        for ri, row in enumerate(rows):
            cells = [
                cb
                for ci, spec in enumerate(row)
                if (cb := cell_bytes(ci, spec)) is not None
            ]
            if cells:
                # BrtRowHdr: rw + 13 bytes of defaults we don't consume
                body += _record(
                    BRT_ROW_HDR, struct.pack("<I", ri) + b"\x00" * 13
                )
                for cb in cells:
                    body += cb
        sheet_blobs.append(bytes(body))

    wb = bytearray()
    rels_xml = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">',
    ]
    for i, name in enumerate(sheets.keys()):
        rid = f"rId{i + 1}"
        payload = (
            struct.pack("<II", 0, i + 1) + _wide(rid) + _wide(name)
        )  # hsState, iTabID, strRelID, strName
        wb += _record(BRT_BUNDLE_SH, payload)
        rels_xml.append(
            f'<Relationship Id="{rid}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.bin"/>'
        )
    rels_xml.append("</Relationships>")

    sst_blob = bytearray()
    for s in sst:
        sst_blob += _record(BRT_SST_ITEM, b"\x00" + _wide(s))

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("xl/workbook.bin", bytes(wb))
        z.writestr("xl/_rels/workbook.bin.rels", "".join(rels_xml))
        if sst:
            z.writestr("xl/sharedStrings.bin", bytes(sst_blob))
        for i, blob in enumerate(sheet_blobs):
            z.writestr(f"xl/worksheets/sheet{i + 1}.bin", blob)
    return path
