"""Pins for the stdlib WAV codec (functions/wav.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_to_parquet_spark.functions.wav import decode_wav, encode_wav


def test_round_trip_mono_16bit():
    t = np.arange(8000)
    s = (10_000 * np.sin(2 * np.pi * 440 * t / 16_000)).astype(np.int16)
    back, rate = decode_wav(encode_wav(s, 16_000))
    assert rate == 16_000
    assert back.dtype == np.int16
    assert (back == s).all()


def test_round_trip_stereo_8bit():
    rng = np.random.default_rng(5)
    s = rng.integers(0, 256, (1000, 2), dtype=np.uint8)
    back, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert back.shape == (1000, 2)
    assert (back == s).all()


def test_odd_length_8bit_word_alignment():
    s = np.arange(33, dtype=np.uint8)  # odd data size forces a pad byte
    data = encode_wav(s, 8000)
    assert len(data) % 2 == 0
    back, _ = decode_wav(data)
    assert (back == s).all()


def test_decoder_skips_foreign_chunks():
    s = np.arange(64, dtype=np.int16)
    data = bytearray(encode_wav(s, 44_100))
    # splice a LIST chunk between fmt and data
    di = data.index(b"data")
    chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(data[:di]) + chunk + bytes(data[di:])
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    back, rate = decode_wav(spliced)
    assert rate == 44_100
    assert (back == s).all()


def test_rejects_non_wav_and_non_pcm():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"\x00" * 16)
    s = np.arange(8, dtype=np.int16)
    data = bytearray(encode_wav(s, 8000))
    fi = data.index(b"fmt ")
    data[fi + 8 : fi + 10] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="only PCM"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError, match="uint8 or int16"):
        encode_wav(np.zeros(4, dtype=np.float32))
