"""Pins for the stdlib GIF codec (functions/gif.py): exact round-trip
identity, LZW edge cases (dictionary growth past code-size boundaries,
KwKwK, mid-stream clear at 4096), interlaced decode, and palette handling.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_to_parquet_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
    quantize_332,
)


def test_round_trip_small_palette():
    img = np.zeros((20, 30, 3), np.uint8)
    img[5:10, 5:20] = [200, 10, 50]
    img[12:, 25:] = [0, 255, 0]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_round_trip_quantized_noise():
    rng = np.random.default_rng(7)
    img = quantize_332(rng.integers(0, 256, (37, 53, 3), dtype=np.uint8))
    data = encode_gif(img)
    assert data[:6] == b"GIF89a"
    assert (decode_gif(data) == img).all()


def test_round_trip_single_color_and_single_pixel():
    flat = np.full((9, 11, 3), 77, np.uint8)
    assert (decode_gif(encode_gif(flat)) == flat).all()
    one = np.array([[[1, 2, 3]]], np.uint8)
    assert (decode_gif(encode_gif(one)) == one).all()


def test_encode_rejects_too_many_colors():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(img)


def test_quantize_332_spans_full_range_and_bounds_colors():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    q = quantize_332(img)
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 256
    full = quantize_332(np.full((1, 1, 3), 255, np.uint8))
    assert (full == 255).all()
    zero = quantize_332(np.zeros((1, 1, 3), np.uint8))
    assert (zero == 0).all()


def test_lzw_dictionary_growth_and_clear():
    # long non-repeating-ish stream forces code-size growth and (at 4096
    # entries) a mid-stream clear; decode must track both
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 40_000, dtype=np.uint8)
    enc = _lzw_encode(data, 8)
    dec = _lzw_decode(enc, 8, len(data))
    assert (dec == data).all()


def test_lzw_kwkwk_case():
    # 'aaaa...' triggers the code == len(table) branch immediately
    data = np.zeros(64, dtype=np.uint8)
    enc = _lzw_encode(data, 2)
    assert (_lzw_decode(enc, 2, 64) == data).all()


def test_decode_interlaced():
    """Hand-build an interlaced GIF: rows stored in four-pass order with
    the interlace flag set must come back in display order."""
    h, w = 11, 4
    img = np.stack(
        [np.full((w, 3), 20 * r, np.uint8) for r in range(h)]
    )  # row r = color 20r: row identity is visible in the output
    palette = np.unique(img.reshape(-1, 3), axis=0)
    lut = {tuple(c): i for i, c in enumerate(palette)}
    indices = np.array(
        [[lut[tuple(px)] for px in row] for row in img], dtype=np.uint8
    )
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    stored = indices[order]  # four-pass physical layout

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
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    min_code = max(2, pal_bits)
    out.append(min_code)
    lzw = _lzw_encode(stored.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):
        out.append(len(lzw[i : i + 255]))
        out += lzw[i : i + 255]
    out += b"\x00\x3b"
    assert (decode_gif(bytes(out)) == img).all()


def test_animated_round_trip():
    rng = np.random.default_rng(13)
    base = quantize_332(rng.integers(0, 256, (14, 22, 3), dtype=np.uint8))
    frames = [np.roll(base, k, axis=1) for k in range(5)]
    data = encode_gif_frames(frames, delay_cs=7)
    back = decode_gif_frames(data)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()
    # first-frame decode agrees with the multi-frame decoder
    assert (decode_gif(data) == frames[0]).all()


def test_animated_subrect_composites_onto_canvas():
    """A frame covering only a sub-rectangle must paint over the previous
    canvas (disposal 'none'), not reset it."""
    h, w = 10, 12
    f0 = np.zeros((h, w, 3), np.uint8)
    data = bytearray(encode_gif_frames([f0, f0]))
    # rewrite the SECOND image descriptor to a 2x3 rect at (4, 5) and
    # re-encode its pixel data as palette index of f0's single color
    # (simpler: build manually)
    palette = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # 2-entry GCT (bits=1)
    out += palette.tobytes()
    full = _lzw_encode(np.zeros(h * w, np.uint8), 2)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([2])
    out += bytes([len(full)]) + full + b"\x00"
    rect = _lzw_encode(np.ones(2 * 3, np.uint8), 2)
    out += b"\x2c" + struct.pack("<HHHHB", 5, 4, 3, 2, 0) + bytes([2])
    out += bytes([len(rect)]) + rect + b"\x00"
    out += b"\x3b"
    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    assert (frames[0] == 0).all()
    expected = frames[0].copy()
    expected[4:6, 5:8] = [255, 0, 0]
    assert (frames[1] == expected).all()


def test_decode_skips_extension_blocks():
    img = np.full((5, 7, 3), 9, np.uint8)
    data = bytearray(encode_gif(img))
    # splice a graphic-control extension right before the image descriptor
    idx = data.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(data[:idx]) + gce + bytes(data[idx:])
    assert (decode_gif(spliced) == img).all()
