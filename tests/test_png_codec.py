"""PNG codec pins: round-trip identity, all five filter reconstructions,
and agreement with the header parser used by the multimodal manifest."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_to_parquet_spark.functions.png import (
    decode_png,
    encode_png,
    resize_nearest,
)
from data_to_parquet_spark.operators.multimodal import image_header_dims


def _rand_img(h, w, channels, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if channels == 3 else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("h,w,channels", [(1, 1, 1), (7, 5, 1), (24, 33, 3), (64, 64, 3)])
def test_roundtrip_identity(h, w, channels):
    img = _rand_img(h, w, channels, seed=h * 100 + w)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_header_parser_agrees_with_codec():
    img = _rand_img(17, 41, 3, seed=1)
    fmt, w, h = image_header_dims(encode_png(img))
    assert (fmt, w, h) == ("png", 41, 17)


def _encode_with_filter(img: np.ndarray, f: int) -> bytes:
    """Hand-build a PNG whose every scanline uses filter ``f`` — exercises
    the decoder's reconstruction paths beyond what encode_png emits."""
    h, w = img.shape[0], img.shape[1]
    bpp = 3 if img.ndim == 3 else 1
    flat = img.reshape(h, w * bpp).astype(np.int32)
    stride = w * bpp
    lines = []
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - (left + prior) // 2
        else:  # paeth
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if bpp == 3 else 0, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_decoder_reconstructs_every_filter(f):
    img = _rand_img(9, 13, 3, seed=42 + f)
    assert np.array_equal(decode_png(_encode_with_filter(img, f)), img)


def test_resize_nearest_semantics():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(img, (8, 8))
    assert up.shape == (8, 8)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(up[0:2, 0:2], np.zeros((2, 2), np.uint8))
    assert up[7, 7] == 15
    down = resize_nearest(img, (2, 2))
    assert np.array_equal(down, np.array([[0, 2], [8, 10]], dtype=np.uint8))
    rgb = _rand_img(10, 6, 3, seed=7)
    assert resize_nearest(rgb, (5, 3)).shape == (5, 3, 3)


def test_decode_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")
