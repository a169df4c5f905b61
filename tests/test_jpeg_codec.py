"""Pins for the stdlib baseline-JPEG codec (functions/jpeg.py).

JPEG is lossy, so the contract is: exact dimensions, bounded pixel error
on smooth content, EXACT reproduction of flat fields (every DCT
coefficient except DC quantizes to zero), correct marker structure as seen
by an independent parser, and restart-marker resynchronization.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_to_parquet_spark.functions.jpeg import (
    _BitWriter,
    _canonical_codes,
    _magnitude,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _QUANT_LUMA,
    _scaled_quant,
    _ZIGZAG,
    _C,
    decode_jpeg,
    encode_jpeg,
)
from data_to_parquet_spark.operators.multimodal import image_header_dims


def _gradient(h, w):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xs * 2) % 256, (ys * 3) % 256, (xs + ys) % 256], -1
    ).astype(np.uint8)


def test_round_trip_smooth_rgb_bounded_error():
    img = _gradient(48, 64)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    diff = np.abs(dec.astype(int) - img.astype(int))
    assert diff.max() <= 8
    assert diff.mean() < 1.5


def test_flat_field_is_exact():
    for v in (0, 130, 255):
        flat = np.full((24, 40, 3), v, np.uint8)
        dec = decode_jpeg(encode_jpeg(flat, quality=90))
        assert np.abs(dec.astype(int) - v).max() <= 1


def test_non_multiple_of_8_dims():
    img = _gradient(13, 21)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_grayscale_round_trip():
    ys, xs = np.mgrid[0:32, 0:40]
    gray = ((xs * 4) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(gray, quality=90))
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 4


def test_header_walker_reads_encoder_output():
    # the independent FF-marker walker in operators/multimodal.py must see
    # the SOF dims — proves the container structure, not just our decoder
    img = _gradient(17, 29)
    assert image_header_dims(encode_jpeg(img)) == ("jpeg", 29, 17)


def test_quality_scaling_monotone_size():
    img = _gradient(64, 64)
    sizes = [len(encode_jpeg(img, q)) for q in (25, 50, 75, 95)]
    assert sizes == sorted(sizes)


def test_scaled_quant_bounds():
    assert (_scaled_quant(_QUANT_LUMA, 1) <= 255).all()
    assert (_scaled_quant(_QUANT_LUMA, 100) >= 1).all()
    assert (_scaled_quant(_QUANT_LUMA, 50) == _QUANT_LUMA).all()


def test_dct_matrix_orthonormal():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_magnitude_categories():
    assert _magnitude(0) == (0, 0)
    assert _magnitude(1) == (1, 1)
    assert _magnitude(-1) == (1, 0)
    assert _magnitude(5) == (3, 5)
    assert _magnitude(-5) == (3, 2)


def test_rejects_progressive_and_corrupt():
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")


def test_restart_marker_resync():
    """Hand-assemble a 2-MCU grayscale scan with DRI=1 and an RST0 between
    MCUs; decode must byte-align, consume the marker, and reset the DC
    predictor."""
    qt = _scaled_quant(_QUANT_LUMA, 90)
    dc = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)

    values = (40, 200)  # one flat 8x8 block per MCU
    h, w = 8, 16

    def encode_block(bw, dc_val):
        # flat block: DC = 8*(v-128)/q00 rounded, all ACs zero; predictor
        # resets at the restart so each block codes its own absolute DC
        s, bits = _magnitude(dc_val)
        code, ln = dc[s]
        bw.put(code, ln)
        if s:
            bw.put(bits, s)
        code, ln = ac[0x00]  # EOB
        bw.put(code, ln)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(x) for x in qt.reshape(64)[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for tc_th, bits_l, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits_l) + bytes(vals)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1 MCU
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += b"\x00\x3f\x00"
    segs = []
    for v in values:
        bw = _BitWriter()
        dc_val = round(8 * (v - 128) / int(qt[0, 0]))
        encode_block(bw, dc_val)
        segs.append(bw.flush())
    out += segs[0] + b"\xff\xd0" + segs[1]
    out += b"\xff\xd9"

    dec = decode_jpeg(bytes(out))
    assert dec.shape == (8, 16)
    left, right = dec[:, :8], dec[:, 8:]
    assert np.abs(left.astype(int) - values[0]).max() <= 6
    assert np.abs(right.astype(int) - values[1]).max() <= 6
    assert (left == left[0, 0]).all() and (right == right[0, 0]).all()
