"""Property-based pins (hypothesis) for the round-5 codecs: the LZW core,
GIF container round-trip over arbitrary small-palette images, WAV PCM
round-trip over arbitrary sample buffers, and JPEG structural invariants
over arbitrary geometry."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_to_parquet_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from data_to_parquet_spark.functions.jpeg import decode_jpeg, encode_jpeg
from data_to_parquet_spark.functions.wav import decode_wav, encode_wav


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=2000),
    bits=st.integers(min_value=2, max_value=8),
)
def test_lzw_round_trip_arbitrary_bytes(data, bits):
    arr = (np.frombuffer(data, dtype=np.uint8) % (1 << bits)).astype(
        np.uint8
    )
    enc = _lzw_encode(arr, bits)
    if len(arr):
        assert (_lzw_decode(enc, bits, len(arr)) == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_round_trip_small_palette(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, (h, w))]
    assert (decode_gif(encode_gif(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100]),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_round_trip(n, ch, rate, bits, seed):
    rng = np.random.default_rng(seed)
    if bits == 8:
        s = rng.integers(0, 256, (n, ch), dtype=np.uint8)
    else:
        s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
    if ch == 1:
        s = s[:, 0]
    back, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert back.shape == s.shape
    assert (back == s).all()


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    v=st.integers(0, 255),
)
def test_jpeg_flat_field_any_geometry(h, w, v):
    # structural invariants for arbitrary (including non-multiple-of-8)
    # geometry; flat fields additionally decode near-exactly at any size
    flat = np.full((h, w, 3), v, np.uint8)
    dec = decode_jpeg(encode_jpeg(flat, quality=90))
    assert dec.shape == (h, w, 3)
    assert np.abs(dec.astype(int) - v).max() <= 1
