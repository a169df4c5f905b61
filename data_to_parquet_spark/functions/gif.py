"""Minimal real GIF codec — stdlib ``struct`` + numpy only.

Like ``png.py``, this exists because the container ships no imaging
library, and GIF needs none: it is LZW-compressed palette indices inside a
block-structured container (GIF89a spec). The encoder writes a single
non-interlaced frame with a global color table built from the image's
unique colors (≤256 — callers with richer images quantize first, see
:func:`quantize_332`); the decoder handles GIF87a/GIF89a, global and local
color tables, extension blocks, and the four-pass interlace layout, so it
reads GIFs from other writers too.

Variable-code-size LZW is implemented exactly per spec: initial code size
``max(2, palette_bits)``, Clear/EOI codes, dictionary growth to 4096 with
deferred-clear tolerance on decode.

Pinned by tests/test_gif_codec.py (round-trip identity, interlace
reconstruction, palette edge cases).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_gif",
    "encode_gif_frames",
    "decode_gif",
    "decode_gif_frames",
    "quantize_332",
]


def quantize_332(arr: np.ndarray) -> np.ndarray:
    """Map an (H, W, 3) uint8 image onto the fixed 3-3-2-bit RGB palette —
    the standard web-safe-style reduction that guarantees ≤256 colors so
    any image becomes GIF-encodable. Returns the quantized RGB image."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    r = a[..., 0] & 0xE0
    g = a[..., 1] & 0xE0
    b = a[..., 2] & 0xC0
    # replicate the kept high bits into the low bits so the palette spans
    # the full 0..255 range (0xE0 -> 0xFF, not 0xE0)
    r = r | (r >> 3) | (r >> 6)
    g = g | (g >> 3) | (g >> 6)
    b = b | (b >> 2) | (b >> 4) | (b >> 6)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


# --- LZW ------------------------------------------------------------------


def _palette_and_inverse(flat: np.ndarray):
    """``np.unique(flat, axis=0, return_inverse=True)`` for (N, 3) uint8
    pixel rows, via a packed 24-bit integer key. Ascending key order IS
    lexicographic (r, g, b) order — r occupies the high byte — so both the
    palette and the inverse indices are IDENTICAL to the axis=0 form; the
    1-D integer sort just skips numpy's structured-view comparison, which
    profiled as ~45% of whole-GIF encode time (r15)."""
    key = (
        (flat[:, 0].astype(np.int32) << 16)
        | (flat[:, 1].astype(np.int32) << 8)
        | flat[:, 2].astype(np.int32)
    )
    uk, inv = np.unique(key, return_inverse=True)
    palette = np.stack(
        [(uk >> 16) & 0xFF, (uk >> 8) & 0xFF, uk & 0xFF], axis=-1
    ).astype(np.uint8)
    return palette, inv


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF variable-code-size LZW over a flat palette-index array.

    The dictionary is keyed by ``(prefix_code << 8) | next_byte`` ints
    instead of growing byte strings (r15): every multi-byte string the
    classic formulation builds is reachable only by extending an
    already-tabled prefix, so its code stands in for the prefix bytes —
    the emitted code stream (and thus the GIF bytes) is identical, with
    no per-pixel bytes allocation/hash. Single-byte strings need no
    table: a palette index IS its own literal code (< clear)."""
    # the byte-wise walk below reads raw buffer bytes — a wider dtype
    # (e.g. an int array from arithmetic promotion) would interleave
    # zero bytes silently
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    code_size = min_code_size + 1
    table: dict[int, int] = {}

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    data = indices.tobytes()
    if data:
        prev = data[0]  # literal code == palette index
        table_get = table.get
        for v in data[1:]:
            k = (prev << 8) | v
            e = table_get(k)
            if e is not None:
                prev = e
                continue
            emit(prev)
            table[k] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1:
                code_size += 1
            if next_code >= 4096:
                emit(clear)
                table = {}
                table_get = table.get
                next_code = eoi + 1
                code_size = min_code_size + 1
            prev = v
        emit(prev)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; tolerates deferred clear codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while pos < n or nbits >= code_size:
        while nbits < code_size and pos < n:
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        if (
            len(table) == (1 << code_size)
            and code_size < 12
        ):
            code_size += 1
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(
            f"LZW stream ended early: {len(out)} of {n_pixels} pixels"
        )
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# --- container ------------------------------------------------------------


def encode_gif(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array with ≤256 unique colors → GIF89a bytes.

    Raises ``ValueError`` beyond 256 colors — quantize first
    (:func:`quantize_332`); silent lossy quantization here would break the
    round-trip contract the tests pin.
    """
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects an (H, W, 3) uint8 array")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    palette, indices = _palette_and_inverse(flat)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(f"{n_colors} colors > 256; quantize first")
    pal_bits = max(1, int(n_colors - 1).bit_length())
    table_size = 1 << pal_bits
    pal_bytes = np.zeros((table_size, 3), dtype=np.uint8)
    pal_bytes[:n_colors] = palette

    out = bytearray()
    out += b"GIF89a"
    # logical screen descriptor: GCT present, pal_bits-1 in both fields
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0
    )
    out += pal_bytes.tobytes()
    # image descriptor (no local table, no interlace)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(2, pal_bits)
    out.append(min_code_size)
    lzw = _lzw_encode(indices.astype(np.uint8), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif_frames(
    frames: list[np.ndarray], delay_cs: int = 10
) -> bytes:
    """List of same-shape (H, W, 3) uint8 frames → animated GIF89a bytes.

    One global color table over the union of all frames' colors (≤256 —
    quantize first otherwise); each frame is a full-canvas image block
    preceded by a graphic-control extension carrying ``delay_cs``
    (centiseconds). This is the "video as a stack of frames" container the
    frame-sampling operator decodes.
    """
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    stack = []
    for f in frames:
        a = np.ascontiguousarray(f, dtype=np.uint8)
        if a.shape != (h, w, 3):
            raise ValueError("all frames must be identical (H, W, 3)")
        stack.append(a)
    allpx = np.concatenate([a.reshape(-1, 3) for a in stack])
    palette, inv = _palette_and_inverse(allpx)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors > 256; quantize first")
    pal_bits = max(1, int(len(palette) - 1).bit_length())
    table_size = 1 << pal_bits
    pal_bytes = np.zeros((table_size, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0
    )
    out += pal_bytes.tobytes()
    min_code_size = max(2, pal_bits)
    per = h * w
    for fi in range(len(stack)):
        # graphic control extension: disposal=none, no transparency
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code_size)
        idx = inv[fi * per : (fi + 1) * per].astype(np.uint8)
        lzw = _lzw_encode(idx, min_code_size)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes → list of full-canvas (H, W, 3) uint8 RGB frames.

    Sub-rectangle frames are composited onto the running canvas (disposal
    "none" semantics — each frame paints over the previous one), which is
    what a frame sampler needs. GCE transparency is not applied (the
    encoder above never writes it); interlaced frames are reordered.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        if block == 0x21:
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(lzw), min_code_size, iw * ih)
            rows = indices.reshape(ih, iw)
            if iflags & 0x40:
                ordered = np.empty_like(rows)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    n_rows = len(range(start, ih, step))
                    ordered[start:ih:step] = rows[src : src + n_rows]
                    src += n_rows
                rows = ordered
            canvas[iy : iy + ih, ix : ix + iw] = pal[rows]
            frames.append(canvas.copy())
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("no image data in GIF")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB array (first frame)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(lzw), min_code_size, iw * ih)
            rows = indices.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: rows arrive in four passes
                ordered = np.empty_like(rows)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    n_rows = len(range(start, ih, step))
                    ordered[start:ih:step] = rows[src : src + n_rows]
                    src += n_rows
                rows = ordered
            return pal[rows]
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("no image data in GIF")
