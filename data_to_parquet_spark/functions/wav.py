"""Minimal real WAV (RIFF/PCM) codec — stdlib ``struct`` + numpy only.

The audio twin of ``png.py``/``gif.py``/``jpeg.py``: WAV needs no audio
library — it is raw PCM samples behind a fixed RIFF chunk layout. Supports
8-bit unsigned and 16-bit signed PCM, mono or interleaved multi-channel;
the decoder walks the chunk chain (skipping LIST/fact/etc.) so it reads
files from other writers too.

Pinned by tests/test_wav_codec.py (round-trip identity, chunk-walk
robustness, format rejection).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """PCM samples → WAV bytes.

    ``samples``: (N,) mono or (N, C) interleaved; dtype uint8 (8-bit
    unsigned PCM) or int16 (16-bit signed PCM).
    """
    a = np.ascontiguousarray(samples)
    if a.dtype == np.uint8:
        bits = 8
    elif a.dtype == np.int16:
        bits = 16
    else:
        raise ValueError("encode_wav expects uint8 or int16 samples")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be (N,) or (N, channels)")
    n, ch = a.shape
    data = a.tobytes()  # row-major = interleaved frames
    block_align = ch * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples, sample_rate); samples shaped (N,) for mono,
    (N, C) otherwise, dtype uint8 or int16 per the stored bit depth."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # word alignment
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise ValueError("only PCM WAV supported")
    if bits == 8:
        a = np.frombuffer(pcm, dtype=np.uint8)
    elif bits == 16:
        a = np.frombuffer(pcm, dtype="<i2")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if ch > 1:
        a = a[: len(a) // ch * ch].reshape(-1, ch)
    return a, rate
