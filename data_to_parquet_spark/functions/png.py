"""Minimal real PNG codec — stdlib ``zlib`` + ``struct`` + numpy only.

The container ships no imaging library (PIL/cv2), but PNG itself needs
none: it is zlib-compressed filtered scanlines inside CRC'd chunks
(RFC 2083). This module implements the subset the multimodal operators
need — 8-bit grayscale (color type 0) and RGB (color type 2), no
interlace — so the decode → transform → re-encode pipeline stage works on
REAL pixels end to end.

Encoder writes filter 0 (None) scanlines; decoder reconstructs all five
standard filters (None/Sub/Up/Average/Paeth), so it reads PNGs produced by
other writers too. Pinned by tests/test_png_codec.py (round-trip identity +
per-filter reconstruction vectors).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png", "resize_nearest"]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(arr: np.ndarray) -> bytes:
    """RGB (H, W, 3) or grayscale (H, W) uint8 array → PNG bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, h, w = 0, a.shape[0], a.shape[1]
        flat = a
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, h, w = 2, a.shape[0], a.shape[1]
        flat = a.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.empty((h, flat.shape[1] + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = flat
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W) for grayscale, (H, W, 3) for RGB.

    Supports bit depth 8, color types 0/2, no interlace — exactly what
    :func:`encode_png` emits, plus all five scanline filters.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    bpp = 3 if color_type == 2 else 1
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    # all-None-filter fast path: this encoder always writes filter 0, so
    # its own output reconstructs as one slice copy instead of a per-row
    # Python loop (r15; foreign PNGs with real filters take the loop below)
    if not raw[:, 0].any():
        out = raw[:, 1:].copy()
        return out if color_type == 0 else out.reshape(h, w, 3)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, line = raw[y, 0], raw[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorizable
            rec = (line + prior) & 0xFF
        else:  # Sub/Average/Paeth depend on the left neighbor: sequential
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if f == 1:
                    rec[x] = (line[x] + left) & 0xFF
                elif f == 3:
                    rec[x] = (line[x] + (left + up) // 2) & 0xFF
                elif f == 4:
                    rec[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
                else:
                    raise ValueError(f"bad filter {f}")
        out[y] = rec
    return out if color_type == 0 else out.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (new_h, new_w) — pure index sampling."""
    new_h, new_w = size
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return arr[ys][:, xs]
