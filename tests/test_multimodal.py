"""Golden tests for the multimodal decode step: real PNG/JPEG/GIF header
parses (stdlib struct fixtures built byte-by-byte, no image libs needed)
plus the deterministic stub fallback, end-to-end through mapInPandas."""

from __future__ import annotations

import struct
import hashlib
import zlib

from data_to_parquet_spark.operators.multimodal import (
    _MANIFEST_SCHEMA,
    decode_binary_batches,
    image_header_dims,
    stub_decode_binary_batches,
)


def make_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + b"\x00" * 32  # truncated body; header parse doesn't need it
    )


def make_jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    # SOF0: len=17, 8-bit precision, height, width, 3 components
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03"
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 16


def test_image_header_dims_golden():
    assert image_header_dims(make_png(640, 480)) == ("png", 640, 480)
    assert image_header_dims(make_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    assert image_header_dims(make_gif(320, 200)) == ("gif", 320, 200)
    # progressive JPEG uses SOF2 (0xC2) — same frame-header layout
    prog = make_jpeg(99, 44).replace(b"\xff\xc0", b"\xff\xc2")
    assert image_header_dims(prog) == ("jpeg", 99, 44)
    assert image_header_dims(b"just some text bytes") is None
    assert image_header_dims(b"") is None
    assert image_header_dims(b"\xff\xd8\x00garbage") is None  # corrupt chain
    assert image_header_dims(make_png(1, 1)[:20]) is None  # truncated IHDR


def test_decode_manifest_end_to_end_real_images(spark):
    rows = [
        (1, "image", make_png(640, 480)),
        (2, "image", make_jpeg(1024, 768)),
        (3, "image", make_gif(320, 200)),
        (4, "audio", b"not an image payload at all"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, modality string, payload binary"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in df.mapInPandas(
            decode_binary_batches, _MANIFEST_SCHEMA
        ).collect()
    }
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("png", 640, 480)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("jpeg", 1024, 768)
    assert (out[3]["format"], out[3]["width"], out[3]["height"]) == ("gif", 320, 200)
    assert out[4]["format"] == "unknown"  # stub fallback path
    for doc_id, _, payload in [(r[0], r[1], r[2]) for r in rows]:
        expected = int(hashlib.md5(payload).hexdigest()[:15], 16)
        assert out[doc_id]["checksum"] == expected
        assert out[doc_id]["n_bytes"] == len(payload)


def test_stub_kernel_ignores_ascii_gif_magic(spark):
    """ADVICE r7 regression pin: the GIF magic is pure ASCII, so a TEXT
    payload can begin with it. The oracled manifest query must replay the
    stub arithmetic for such payloads (like its DuckDB oracle), while the
    header-parsing kernel takes the real-GIF branch on the same bytes."""
    payload = b"GIF89a looks like an image but is prose"
    df = spark.createDataFrame(
        [(1, "image", payload)], "doc_id long, modality string, payload binary"
    )
    stubbed = df.mapInPandas(
        stub_decode_binary_batches, _MANIFEST_SCHEMA
    ).collect()[0]
    n = len(payload)
    assert stubbed["format"] == "unknown"
    assert stubbed["width"] == 64 + n % 577
    assert stubbed["height"] == 64 + (n * 7) % 577
    assert stubbed["checksum"] == int(
        hashlib.md5(payload).hexdigest()[:15], 16
    )
    parsed = df.mapInPandas(
        decode_binary_batches, _MANIFEST_SCHEMA
    ).collect()[0]
    assert parsed["format"] == "gif"  # header branch still fires elsewhere


def test_png_manifest_real_roundtrip(spark, sf_dir):
    """The oracled query's claim, checked directly: synth → encode → parse
    recovers the deterministic dimensions for every document."""
    from data_to_parquet_spark.operators.multimodal import (
        multimodal_png_manifest,
    )

    rows = multimodal_png_manifest(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["format"] == "png"
        assert r["width"] == 16 + r["doc_id"] % 48
        assert r["height"] == 12 + r["doc_id"] % 36


def test_png_resize_pixel_correctness(spark, sf_dir):
    """Decode the resized output and compare pixels against the
    numpy-computed expectation — the resize stage is real, not a stub."""
    import numpy as np

    from data_to_parquet_spark.functions.png import decode_png, resize_nearest
    from data_to_parquet_spark.operators.multimodal import (
        _synth_image,
        multimodal_resize_png,
    )

    out = multimodal_resize_png(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    assert len(out) == 5
    for r in out:
        got = decode_png(bytes(r["resized_png"]))
        expect = resize_nearest(_synth_image(int(r["doc_id"])), (64, 64))
        assert got.shape == (64, 64, 3)
        assert np.array_equal(got, expect)
        assert (r["orig_width"], r["orig_height"]) == (
            16 + r["doc_id"] % 48,
            12 + r["doc_id"] % 36,
        )
