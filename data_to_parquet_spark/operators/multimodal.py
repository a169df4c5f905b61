"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

All three image formats have REAL codecs (no PIL/cv2 anywhere): PNG
(``functions/png.py``, stdlib zlib), GIF (``functions/gif.py``, LZW), and
baseline JPEG (``functions/jpeg.py``, Huffman+DCT) — encode, full pixel
decode, and resize all run on actual pixels (see
``multimodal_mixed_manifest`` / ``multimodal_resize_png``), audio has a
real WAV codec (``functions/wav.py``), and frame sampling decodes real
animated GIFs (``multimodal_frame_sample``). The manifest decode step
additionally parses bare headers (IHDR / SOF marker walk / logical screen
descriptor) for arbitrary external payloads; bytes that are not a
recognized image fall back to a clearly marked deterministic STUB
(``multimodal_resize_stub`` keeps the opaque-payload plumbing demo, and
non-GIF video containers would need a real parser). Everything
Spark-side is real and is what matters at scale: the binary column schema,
the mapInPandas batch shape (pandas ``bytes`` objects in, struct-typed
metadata out), and the no-shuffle narrow execution.

At 100 TB the payloads come from ``spark.read.format("binaryFile")`` or
parquet binary columns; this operator keeps that exact interface.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .base import Registry, load_table

_D = "double"

MM = Registry()

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def image_header_dims(payload: bytes) -> tuple[str, int, int] | None:
    """Parse (format, width, height) from a real image header, stdlib-only.

    PNG: 8-byte signature, then the IHDR chunk carries two big-endian u32s.
    JPEG: walk the FF-marker segment chain to the first SOFn frame header
    (skipping the non-frame C4/C8/CC markers), which carries height then
    width as big-endian u16s. GIF: 6-byte signature then two little-endian
    u16s. Returns ``None`` when the bytes are not a recognized image — the
    caller falls back to the deterministic stub.
    """
    if (
        payload[:8] == b"\x89PNG\r\n\x1a\n"
        and len(payload) >= 24
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                return None  # corrupt segment chain
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # bare markers
                i += 2
                continue
            if i + 4 > len(payload):
                return None
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(payload):
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    return None


def _decode_stub(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic STUB manifest row: length-derived dimensions plus the
    first 15 hex digits of the payload's md5 as an int64 checksum (the
    S3-ETag-style content fingerprint; md5 is computable by both engines,
    so a stub manifest is fully value-oracle-able — crc32, the previous
    choice, exists in neither DuckDB nor Spark SQL's DuckDB-replayable
    subset)."""
    checksum = int(hashlib.md5(payload).hexdigest()[:15], 16)
    n = len(payload)
    return "unknown", 64 + n % 577, 64 + (n * 7) % 577, checksum


def _decode(payload: bytes) -> tuple[str, int, int, int]:
    """(format, width, height, checksum) — real header parse when the
    payload is PNG/JPEG/GIF, deterministic STUB dimensions otherwise (full
    pixel decode needs PIL/cv2, absent in this container; the fallback
    keeps tests/oracles stable and the Spark plumbing identical)."""
    parsed = image_header_dims(payload)
    if parsed is not None:
        fmt, w, h = parsed
        checksum = int(hashlib.md5(payload).hexdigest()[:15], 16)
        return fmt, w, h, checksum
    return _decode_stub(payload)


def _manifest_batches(
    it: Iterator[pd.DataFrame], decode
) -> Iterator[pd.DataFrame]:
    for pdf in it:
        decoded = [decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "modality": pdf["modality"].values,
                "format": [d[0] for d in decoded],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[1] for d in decoded],
                "height": [d[2] for d in decoded],
                "checksum": [d[3] for d in decoded],
            }
        )


def decode_binary_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, modality, payload) → manifest rows,
    parsing real PNG/JPEG/GIF headers and stubbing everything else."""
    return _manifest_batches(it, _decode)


def stub_decode_binary_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: manifest rows via the UNCONDITIONAL stub.

    Used by the oracled manifest query, whose payloads are UTF-8 text
    stand-ins: the GIF magic ('GIF87a'/'GIF89a') is pure ASCII, so a
    document whose text happens to start with it would flip
    decode_binary_batches into the real-header branch while the DuckDB
    oracle replays the stub arithmetic — a latent cross-engine divergence
    on regenerated testdata (ADVICE r7). Forcing the stub here makes the
    Spark side and the oracle the same function by construction; the
    real-header branch keeps its own coverage via tests/test_multimodal.py
    with actual image payloads."""
    return _manifest_batches(it, _decode_stub)


@MM.register(
    "multimodal_decode_manifest",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
             AS modality,
           'unknown' AS format,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 577 AS INT)
             AS height,
           CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS checksum
    FROM documents
    """,
)
def multimodal_decode_manifest(spark, sf_dir):
    """Binary-column pipeline: attach payloads (UTF-8 bytes of the text stand
    in for image bytes), decode via mapInPandas, emit a typed manifest.

    Scale: narrow map over payload partitions; Arrow moves the binary
    batches; no shuffle. Value-oracled since round 7: the kernel is the
    UNCONDITIONAL stub (r8: was branch-on-header, which could diverge from
    the oracle if a document's text started with the ASCII GIF magic), so
    dimension arithmetic, byte length, and md5-prefix checksum all replay
    in DuckDB — the driver hash-checks the binary plumbing end to end.
    The real-header branch is covered by tests/test_multimodal.py with
    actual PNG/JPEG/GIF payloads.
    """
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return with_payload.mapInPandas(
        stub_decode_binary_batches, _MANIFEST_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def synth_animation_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc_id → real animated-GIF payload with
    ``2 + doc_id % 6`` frames (each frame a horizontal roll of the doc's
    synthetic image, so every frame differs but shares one palette)."""
    import numpy as np

    from ..functions.gif import encode_gif_frames, quantize_332

    def synth(doc_id: int) -> bytes:
        base = quantize_332(_synth_image(doc_id))
        n = 2 + doc_id % 6
        return encode_gif_frames(
            [np.roll(base, k, axis=1) for k in range(n)]
        )

    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload": [synth(int(d)) for d in pdf["doc_id"]],
            }
        )


@MM.register(
    "multimodal_frame_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             2 + doc_id % 6 AS nf,
             CAST(16 + doc_id % 48 AS INT) AS width,
             CAST(12 + doc_id % 36 AS INT) AS height
      FROM documents
    )
    SELECT doc_id,
           CAST(unnest(list_transform(
             generate_series(0, least(4, nf) - 1),
             j -> floor(j * (nf - 1) / (least(4, nf) - 1.0) + 0.5)))
             AS INT) AS frame_index,
           width, height, CAST(nf AS INT) AS n_frames
    FROM p
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """REAL video-style frame sampling, value-checked: synthesize an
    animated GIF per document (``2 + doc_id % 6`` full-canvas frames,
    stdlib codec), then sample up to 4 evenly spaced frames by FULLY
    DECODING the animation — the 1→N fan-out every video pipeline needs,
    with frame geometry read off the decoded arrays. The DuckDB oracle
    reproduces the frame count, the evenly-spaced index arithmetic
    (floor(j·(n-1)/(k-1) + 0.5)), and the dimensions, so a hash match
    proves the multi-frame encoder, the compositing decoder, and the
    sampling policy all agree. (Round 5: replaces the round-1 byte-block
    STUB — the last stubbed multimodal decode path.)

    Scale: two chained narrow maps, no shuffle; output rows ≤ 4× input.
    A production deployment swaps the synth stage for `binaryFile` scans
    and this sampler for a keyframe-seeking one (e.g. PyAV) with the same
    row contract.
    """
    from ..functions.gif import decode_gif_frames

    def sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {k: [] for k in _FRAME_SCHEMA.fieldNames()}
        for pdf in it:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_gif_frames(bytes(payload))
                n = len(frames)
                k = min(4, n)
                idxs = (
                    [0]
                    if k == 1
                    else [
                        int(j * (n - 1) / (k - 1) + 0.5) for j in range(k)
                    ]
                )
                for fi in idxs:
                    f = frames[fi]
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(fi)
                    rows["width"].append(f.shape[1])
                    rows["height"].append(f.shape[0])
                    rows["n_frames"].append(n)
        yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(synth_animation_batches, _PNG_PAYLOAD_SCHEMA)
        .mapInPandas(sample_batches, _FRAME_SCHEMA)
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_width", T.IntegerType()),
        T.StructField("orig_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

_TARGET = 224  # canonical vision-model input edge


def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode → resize to 224×224 → re-encode.

    STUB resizer — a real one would be PIL/cv2; the deterministic fake
    derives 'pixels' from the payload bytes and nearest-neighbor-samples
    them, so batch shapes, binary-out columns and byte budgets are real.
    Original dimensions come from the real header parse when the payload
    is a recognized image format.
    """
    for pdf in it:
        rows = {k: [] for k in ("doc_id", "orig_width", "orig_height", "width", "height", "resized")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _, w, h, _ = _decode(payload)
            # nearest-neighbor sample _TARGET "pixels" per axis from payload
            n = max(len(payload), 1)
            idx = [(i * n) // _TARGET for i in range(_TARGET)]
            resized = bytes(payload[i % n] for i in idx)
            rows["doc_id"].append(doc_id)
            rows["orig_width"].append(w)
            rows["orig_height"].append(h)
            rows["width"].append(_TARGET)
            rows["height"].append(_TARGET)
            rows["resized"].append(resized)
        yield pd.DataFrame(rows)


@MM.register("multimodal_resize_stub", oracle=None)
def multimodal_resize_stub(spark, sf_dir):
    """Image-resize pipeline stage: binary in → binary out via mapInPandas
    (decode/resize stubbed, Arrow binary plumbing real).

    Scale: narrow map; output bytes bounded by 224²; the real resizer slots
    into the same kernel without touching the Spark plan.
    """
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return with_payload.mapInPandas(resize_batches, _RESIZE_SCHEMA)


# ---- real PNG pixel path (stdlib zlib + numpy codec, functions/png.py) ----

_PNG_TARGET = 64  # resize edge for the real-pixel path


def _doc_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc image dimensions — mirrored arithmetically in
    the DuckDB oracle, which is what makes the PNG manifest value-checkable
    end to end (synthesize → encode → parse must reproduce these)."""
    return 16 + doc_id % 48, 12 + doc_id % 36  # (width, height)


def _synth_image(doc_id: int):
    import numpy as np

    w, h = _doc_dims(doc_id)
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xs * 3 + doc_id) % 256,
            (ys * 5 + doc_id // 7) % 256,
            (xs ^ ys) % 256,
        ],
        axis=-1,
    ).astype("uint8")


def synth_png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc_id → real PNG payload bytes."""
    from ..functions.png import encode_png

    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload": [
                    encode_png(_synth_image(int(d))) for d in pdf["doc_id"]
                ],
            }
        )


_PNG_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _png_payloads(spark, sf_dir):
    # The documents scan is one small file → one partition at test SF; the
    # per-row codec work is the cost, so spread the skinny doc_id column
    # across every core before the Python stage (8-byte rows — the shuffle
    # is noise next to the encode). At 100 TB real payload scans arrive
    # already partitioned and this repartition drops out.
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(synth_png_batches, _PNG_PAYLOAD_SCHEMA)
    )


@MM.register(
    "multimodal_png_manifest",
    oracle="""
    SELECT doc_id,
           'png' AS format,
           CAST(16 + doc_id % 48 AS INT) AS width,
           CAST(12 + doc_id % 36 AS INT) AS height
    FROM documents
    """,
)
def multimodal_png_manifest(spark, sf_dir):
    """REAL image pipeline, value-checked: synthesize an actual PNG per
    document (stdlib-zlib encoder, ``functions/png.py``), then recover its
    dimensions by parsing the real IHDR header. The DuckDB oracle computes
    the expected dimensions arithmetically, so a hash match proves the
    encoder emits spec-correct PNGs AND the header parser reads them —
    no imaging library anywhere.

    Scale: two chained narrow maps (synthesize, parse) — Arrow moves the
    binary batches, no shuffle; at 100 TB the synth stage is replaced by
    `binaryFile`/parquet binary scans feeding the same parse kernel.
    """

    def parse_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [image_header_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "format": [p[0] if p else "unknown" for p in parsed],
                    "width": [p[1] if p else -1 for p in parsed],
                    "height": [p[2] if p else -1 for p in parsed],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return _png_payloads(spark, sf_dir).mapInPandas(parse_batches, schema)


def resize_png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: PNG in → decode pixels → nearest-neighbor resize
    to 64×64 → re-encode PNG. Real pixels at every step."""
    from ..functions.png import decode_png, encode_png, resize_nearest

    for pdf in it:
        rows = {
            k: []
            for k in (
                "doc_id",
                "orig_width",
                "orig_height",
                "width",
                "height",
                "resized_png",
            )
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = decode_png(bytes(payload))
            small = resize_nearest(img, (_PNG_TARGET, _PNG_TARGET))
            rows["doc_id"].append(doc_id)
            rows["orig_width"].append(img.shape[1])
            rows["orig_height"].append(img.shape[0])
            rows["width"].append(_PNG_TARGET)
            rows["height"].append(_PNG_TARGET)
            rows["resized_png"].append(encode_png(small))
        yield pd.DataFrame(rows)


_PNG_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_width", T.IntegerType()),
        T.StructField("orig_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_png", T.BinaryType()),
    ]
)


def synth_mixed_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc_id → (format, real encoded payload bytes).

    Format rotates png/gif/jpeg by doc_id — every row carries an actual
    codec-produced file of that format (stdlib codecs in functions/)."""
    from ..functions.gif import encode_gif, quantize_332
    from ..functions.jpeg import encode_jpeg
    from ..functions.png import encode_png

    def synth(doc_id: int) -> tuple[str, bytes]:
        img = _synth_image(doc_id)
        f = doc_id % 3
        if f == 0:
            return "png", encode_png(img)
        if f == 1:
            return "gif", encode_gif(quantize_332(img))
        return "jpeg", encode_jpeg(img, quality=90)

    for pdf in it:
        made = [synth(int(d)) for d in pdf["doc_id"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "format": [m[0] for m in made],
                "payload": [m[1] for m in made],
            }
        )


_MIXED_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


@MM.register(
    "multimodal_mixed_manifest",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                ELSE 'jpeg' END AS format,
           CAST(16 + doc_id % 48 AS INT) AS width,
           CAST(12 + doc_id % 36 AS INT) AS height
    FROM documents
    """,
)
def multimodal_mixed_manifest(spark, sf_dir):
    """REAL pixel pipeline across all three image formats, value-checked:
    synthesize an image per document, encode it as PNG, GIF, or JPEG
    (rotating by doc_id; stdlib codecs — ``functions/png.py``, ``gif.py``,
    ``jpeg.py``), then recover dimensions by FULLY DECODING THE PIXELS with
    the matching decoder — width/height come from the decoded array's
    shape, not from a header field. The DuckDB oracle computes the expected
    dimensions arithmetically, so a hash match proves each encoder emits a
    spec-correct file AND each decoder reconstructs the pixel grid at the
    right geometry, for every format, on every row.

    Scale: two chained narrow maps (synthesize, decode) — Arrow moves the
    binary batches, no shuffle; at 100 TB the synth stage is replaced by
    `binaryFile`/parquet binary scans feeding the same decode kernel.
    """
    from ..functions.gif import decode_gif
    from ..functions.jpeg import decode_jpeg
    from ..functions.png import decode_png

    decoders = {"png": decode_png, "gif": decode_gif, "jpeg": decode_jpeg}

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = []
            for fmt, payload in zip(pdf["format"], pdf["payload"]):
                img = decoders[fmt](bytes(payload))
                dims.append((img.shape[1], img.shape[0]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "format": pdf["format"].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    # same single-file-scan consideration as _png_payloads: spread the
    # skinny doc_id input across cores before the codec stages
    d = load_table(spark, sf_dir, "documents")
    payloads = (
        d.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(synth_mixed_batches, _MIXED_PAYLOAD_SCHEMA)
    )
    return payloads.mapInPandas(decode_batches, schema)


_WAV_RATE = 16_000


def synth_wav_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc_id → real 16-bit PCM WAV payload (sine tone,
    frequency and length derived from doc_id)."""
    import numpy as np

    from ..functions.wav import encode_wav

    def synth(doc_id: int) -> bytes:
        n = 4000 + doc_id % 4000
        freq = 220 + doc_id % 440
        t = np.arange(n)
        tone = (10_000 * np.sin(2 * np.pi * freq * t / _WAV_RATE)).astype(
            np.int16
        )
        return encode_wav(tone, _WAV_RATE)

    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload": [synth(int(d)) for d in pdf["doc_id"]],
            }
        )


@MM.register(
    "multimodal_wav_manifest",
    oracle=f"""
    SELECT doc_id,
           {_WAV_RATE} AS sample_rate,
           CAST(4000 + doc_id % 4000 AS BIGINT) AS n_samples,
           CAST(4000 + doc_id % 4000 AS DOUBLE) * 1000 / {_WAV_RATE}
             AS duration_ms
    FROM documents
    """,
)
def multimodal_wav_manifest(spark, sf_dir):
    """REAL audio pipeline, value-checked: synthesize a PCM sine tone per
    document, encode it as an actual WAV file (stdlib RIFF codec,
    ``functions/wav.py``), then recover sample rate and sample count by
    FULLY DECODING the PCM — geometry comes from the decoded array, not a
    header field. The DuckDB oracle computes the expected values
    arithmetically, so a hash match proves the encoder writes spec-correct
    RIFF/PCM and the decoder reconstructs every frame.

    Scale: identical posture to the image manifests — two chained narrow
    maps over Arrow batches, no shuffle; real deployments point the decode
    kernel at `binaryFile`/parquet binary columns instead of the synth
    stage.
    """
    from ..functions.wav import decode_wav

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "sample_rate", "n_samples")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
            out = pd.DataFrame(rows)
            out["duration_ms"] = (
                out["n_samples"].astype("float64") * 1000 / _WAV_RATE
            )
            yield out

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.DoubleType()),
        ]
    )
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(synth_wav_batches, _PNG_PAYLOAD_SCHEMA)
        .mapInPandas(decode_batches, schema)
    )


@MM.register(
    "multimodal_pixel_stats",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             16 + doc_id % 48 AS w,
             12 + doc_id % 36 AS h
      FROM documents
    ), px AS (
      SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS i
      FROM dims
    )
    SELECT doc_id,
           CAST(MAX(w * h) AS BIGINT) AS n_pixels,
           CAST(SUM(((i % w) * 3 + doc_id) % 256) AS BIGINT) AS sum_r,
           CAST(SUM(((i // w) * 5 + doc_id // 7) % 256) AS BIGINT) AS sum_g,
           CAST(SUM(xor(i % w, i // w) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
)
def multimodal_pixel_stats(spark, sf_dir):
    """Pixel CONTENT verification — the strongest multimodal oracle in the
    repo: encode the synthetic image as a real PNG, fully decode it, and
    emit exact per-channel integer sums. The DuckDB oracle recomputes the
    sums arithmetically from the image-synthesis formula (one
    generate_series per pixel), so a hash match proves every single pixel
    survives the encode→compress→decode round trip — not just the
    geometry the manifest queries check.

    Scale: same two chained narrow maps; per-row output is four integers,
    so this doubles as the "feature extraction" stage shape (mean color /
    brightness stats over a 100 TB image corpus).
    """
    from ..functions.png import decode_png

    def stats_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {
                k: []
                for k in ("doc_id", "n_pixels", "sum_r", "sum_g", "sum_b")
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_png(bytes(payload)).astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["n_pixels"].append(img.shape[0] * img.shape[1])
                rows["sum_r"].append(int(img[..., 0].sum()))
                rows["sum_g"].append(int(img[..., 1].sum()))
                rows["sum_b"].append(int(img[..., 2].sum()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )
    return _png_payloads(spark, sf_dir).mapInPandas(stats_batches, schema)


@MM.register(
    "multimodal_resize_pixel_sums",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             16 + doc_id % 48 AS w,
             12 + doc_id % 36 AS h
      FROM documents
    ), px AS (
      SELECT doc_id, w, h, j.j, i.i
      FROM dims, generate_series(0, 63) AS j(j), generate_series(0, 63) AS i(i)
    )
    SELECT doc_id,
           CAST(SUM((i * w // 64 * 3 + doc_id) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((j * h // 64 * 5 + doc_id // 7) % 256) AS BIGINT) AS sum_g,
           CAST(SUM(xor(i * w // 64, j * h // 64) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
)
def multimodal_resize_pixel_sums(spark, sf_dir):
    """Pixel-exact verification of the RESIZE pipeline: synthesize → encode
    PNG → decode → nearest-neighbor resample to 64×64 → re-encode →
    decode AGAIN → exact per-channel sums of the final pixels. The DuckDB
    oracle recomputes the sums from pure index arithmetic (nearest-neighbor
    source index = (dst·src_extent) // 64 composed with the synthesis
    formula), so a hash match proves the resample grid and both codec round
    trips are bit-exact on every one of the 4096 output pixels per doc —
    the strongest claim the multimodal family makes.

    Scale: same chained narrow maps as the other codec stages; output is
    four integers per row.
    """
    import numpy as np

    from ..functions.png import decode_png, encode_png, resize_nearest

    def sums_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "sum_r", "sum_g", "sum_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_png(bytes(payload))
                small = resize_nearest(img, (_PNG_TARGET, _PNG_TARGET))
                final = decode_png(encode_png(small)).astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["sum_r"].append(int(final[..., 0].sum()))
                rows["sum_g"].append(int(final[..., 1].sum()))
                rows["sum_b"].append(int(final[..., 2].sum()))
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )
    return _png_payloads(spark, sf_dir).mapInPandas(sums_batches, schema)


@MM.register("multimodal_resize_png", oracle=None)
def multimodal_resize_png(spark, sf_dir):
    """REAL image-resize stage: decode actual PNG pixels, nearest-neighbor
    resample to 64×64, re-encode — binary in, binary out, zero imaging
    dependencies (codec is stdlib zlib + numpy). Pixel correctness is
    pinned in tests/test_multimodal.py (decode of the output equals the
    numpy-resampled source image).

    Scale: narrow map, output bounded at 64²×3 bytes/row before
    compression. (Rows-only driver check: pixel bytes aren't
    SQL-expressible; the oracled dimension check is
    `multimodal_png_manifest`.)
    """
    return _png_payloads(spark, sf_dir).mapInPandas(
        resize_png_batches, _PNG_RESIZE_SCHEMA
    )


@MM.register(
    "multimodal_resize_digest",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             16 + doc_id % 48 AS w,
             12 + doc_id % 36 AS h
      FROM documents
    ), cells AS (
      SELECT doc_id, w, h, i % {_PNG_TARGET} AS gx, i // {_PNG_TARGET} AS gy,
             ((i % {_PNG_TARGET}) * w) // {_PNG_TARGET} AS sx,
             ((i // {_PNG_TARGET}) * h) // {_PNG_TARGET} AS sy
      FROM d, unnest(generate_series(0, {_PNG_TARGET * _PNG_TARGET - 1})) AS t(i)
    ), px AS (
      SELECT doc_id, w, h, gx, gy,
             (sx * 3 + doc_id) % 256 AS r,
             (sy * 5 + doc_id // 7) % 256 AS g,
             xor(sx, sy) % 256 AS b
      FROM cells
    )
    SELECT doc_id,
           CAST(MAX(w) AS INT) AS orig_width,
           CAST(MAX(h) AS INT) AS orig_height,
           CAST({_PNG_TARGET} AS INT) AS width,
           CAST({_PNG_TARGET} AS INT) AS height,
           CAST(SUM(r) AS BIGINT) AS r_sum,
           CAST(SUM(g) AS BIGINT) AS g_sum,
           CAST(SUM(b) AS BIGINT) AS b_sum,
           CAST(SUM(CASE WHEN gx = gy
                         THEN 299 * r + 587 * g + 114 * b
                         ELSE 0 END) AS BIGINT) AS diag_lum
    FROM px GROUP BY doc_id
    """,
)
def multimodal_resize_digest(spark, sf_dir):
    """Value-oracled digest of the REAL resize pipeline (round 9): take
    `multimodal_resize_png`'s re-encoded 64×64 PNGs, decode them AGAIN,
    and emit per-image channel sums plus a position-sensitive diagonal
    luminance checksum. The DuckDB oracle replays the nearest-neighbor
    sampling arithmetic (sx = gx·w//64, sy = gy·h//64 — the
    `resize_nearest` rule, same floor arithmetic the dhash oracle
    replays) over the synthesized pixel formula, so a hash match proves
    encode → decode → resample → re-encode → decode reproduced every
    pixel bit-exactly end to end. This is the md5-twin pattern applied
    to the last un-oracled multimodal path: `multimodal_resize_png`
    itself stays the binary-out producer (payload bytes are not
    SQL-expressible), with this twin giving the driver a full value
    check of the same dataflow.

    Scale: two chained narrow maps (resize, digest), no shuffle; the
    digest is 4 integers per image regardless of image size.
    """
    import numpy as np

    def digest_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.png import decode_png

        for pdf in it:
            rows = {
                k: []
                for k in (
                    "doc_id",
                    "orig_width",
                    "orig_height",
                    "width",
                    "height",
                    "r_sum",
                    "g_sum",
                    "b_sum",
                    "diag_lum",
                )
            }
            for doc_id, ow, oh, payload in zip(
                pdf["doc_id"],
                pdf["orig_width"],
                pdf["orig_height"],
                pdf["resized_png"],
            ):
                img = decode_png(bytes(payload)).astype(np.int64)
                diag = np.arange(min(img.shape[0], img.shape[1]))
                dpx = img[diag, diag]
                rows["doc_id"].append(doc_id)
                rows["orig_width"].append(ow)
                rows["orig_height"].append(oh)
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["r_sum"].append(int(img[..., 0].sum()))
                rows["g_sum"].append(int(img[..., 1].sum()))
                rows["b_sum"].append(int(img[..., 2].sum()))
                rows["diag_lum"].append(
                    int(
                        (
                            299 * dpx[:, 0]
                            + 587 * dpx[:, 1]
                            + 114 * dpx[:, 2]
                        ).sum()
                    )
                )
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("orig_width", T.IntegerType()),
            T.StructField("orig_height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
            T.StructField("diag_lum", T.LongType()),
        ]
    )
    return multimodal_resize_png(spark, sf_dir).mapInPandas(
        digest_batches, schema
    )


_DHASH_CLASSES = 37  # visual-content classes — forces real duplicate images


def synth_class_png_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc_id → PNG whose CONTENT is keyed by
    doc_id % _DHASH_CLASSES, so distinct documents carry visually
    identical payloads (the near-dup population every image-dedup pass
    hunts for)."""
    from ..functions.png import encode_png

    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload": [
                    encode_png(_synth_image(int(d) % _DHASH_CLASSES))
                    for d in pdf["doc_id"]
                ],
            }
        )


def dhash_hex(img) -> str:
    """Difference hash over a decoded RGB image: nearest-neighbor sample a
    9x8 luminance grid (sx = gx*w//9, sy = gy*h//8 — plain floor), then one
    bit per horizontal neighbor pair (left < right), packed row-major into
    16 hex chars. Integer arithmetic only (luminance = 299R+587G+114B kept
    unscaled), so the oracle can reproduce every bit arithmetically."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    sx = (np.arange(9) * w) // 9
    sy = (np.arange(8) * h) // 8
    px = img[np.ix_(sy, sx)].astype(np.int64)
    lum = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    bits = lum[:, 1:] > lum[:, :-1]  # 8x8 boolean
    weights = 1 << (7 - np.arange(8))
    row_bytes = (bits * weights).sum(axis=1)
    return "".join(f"{b:02X}" for b in row_bytes)


@MM.register(
    "image_dhash_neardup",
    oracle=f"""
    WITH d2 AS (
      SELECT doc_id, doc_id % {_DHASH_CLASSES} AS cls,
             16 + (doc_id % {_DHASH_CLASSES}) % 48 AS w,
             12 + (doc_id % {_DHASH_CLASSES}) % 36 AS h
      FROM documents
    ), grid AS (
      SELECT doc_id, cls, i % 9 AS gx, i // 9 AS gy,
             ((i % 9) * w) // 9 AS sx, ((i // 9) * h) // 8 AS sy
      FROM d2, unnest(generate_series(0, 71)) AS t(i)
    ), gray AS (
      SELECT doc_id, gx, gy,
             299 * ((sx * 3 + cls) % 256)
           + 587 * ((sy * 5 + cls // 7) % 256)
           + 114 * (xor(sx, sy) % 256) AS lum
      FROM grid
    ), bits AS (
      SELECT a.doc_id, a.gy,
             CAST(SUM(CASE WHEN b.lum > a.lum
                           THEN 1 << (7 - a.gx) ELSE 0 END)
                  AS BIGINT) AS row_byte
      FROM gray a JOIN gray b
        ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
      WHERE a.gx < 8
      GROUP BY a.doc_id, a.gy
    ), hashes AS (
      SELECT doc_id,
             string_agg(lpad(to_hex(row_byte), 2, '0'), ''
                        ORDER BY gy) AS dhash
      FROM bits GROUP BY doc_id
    )
    SELECT dhash, COUNT(*) AS n_images,
           MIN(doc_id) AS canonical_doc
    FROM hashes GROUP BY dhash
    HAVING COUNT(*) >= 2
    """,
)
def image_dhash_neardup(spark, sf_dir):
    """Image near-duplicate detection by perceptual difference-hash: every
    document's (real, encoded) PNG is decoded, dHashed, and bucketed; any
    hash shared by ≥2 images is a near-dup cluster. The DuckDB oracle
    re-derives every dHash BIT arithmetically from the synthesis formula —
    a hash match proves the PNG encode→decode round trip AND the
    NN-sample/luminance/gradient pipeline are pixel-exact end to end.

    Scale: the codec+hash stage is a narrow Arrow-batched map (the 100 TB
    shape: binary parquet scan → mapInPandas); the only shuffle is the
    groupBy on the 16-char hash, map-side combined, with output bounded by
    |distinct perceptual hashes|. Exactly the exact-dedup plan
    (dedup.py:34) with a perceptual key instead of sha256 — buckets then
    feed pairwise verification just like the banded-LSH paths.
    """

    def hash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.png import decode_png

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "dhash": [
                        dhash_hex(decode_png(bytes(p)))
                        for p in pdf["payload"]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("dhash", T.StringType()),
        ]
    )
    d = load_table(spark, sf_dir, "documents")
    payloads = (
        d.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(synth_class_png_batches, _PNG_PAYLOAD_SCHEMA)
    )
    return (
        payloads.mapInPandas(hash_batches, schema)
        .groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_images") >= 2)
    )


# Audio feature-extraction synthesis: integer quadratic-residue samples so
# the DuckDB oracle can replay every sample arithmetically (the sine-tone
# synth above is float and libm-dependent, which is why the wav manifest
# oracles geometry only). Samples span ±10000, well inside int16.
_AUDIO_WIN = 1000  # samples per analysis window (62.5 ms at 16 kHz)


def synth_audio_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc_id → real 16-bit PCM WAV whose samples are
    the integer formula ((i*i*7 + doc_id*13) % 20001) - 10000."""
    import numpy as np

    from ..functions.wav import encode_wav

    def synth(doc_id: int) -> bytes:
        n = 4000 + doc_id % 4000
        i = np.arange(n, dtype=np.int64)
        s = ((i * i * 7 + doc_id * 13) % 20001 - 10000).astype(np.int16)
        return encode_wav(s, _WAV_RATE)

    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload": [synth(int(d)) for d in pdf["doc_id"]],
            }
        )


@MM.register(
    "audio_energy_windows",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 4000 + doc_id % 4000 AS n FROM documents
    ), idx AS (
      SELECT doc_id, unnest(generate_series(0, n - 1)) AS i FROM dims
    ), v AS (
      SELECT doc_id, i // {_AUDIO_WIN} AS window_idx,
             (i * i * 7 + doc_id * 13) % 20001 - 10000 AS s
      FROM idx
    )
    SELECT doc_id, CAST(window_idx AS INT) AS window_idx,
           CAST(COUNT(*) AS BIGINT) AS n_in_window,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak,
           sqrt(CAST(SUM(s * s) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) AS rms
    FROM v GROUP BY doc_id, window_idx
    """,
)
def audio_energy_windows(spark, sf_dir):
    """Audio feature extraction with CONTENT verification — the audio
    analog of `multimodal_pixel_stats`, and the stage the wav manifest
    leaves undemonstrated: synthesize integer PCM per document, encode it
    as a real WAV (``functions/wav.py``), fully decode the PCM, and emit
    per-window energy (sum of squares), peak amplitude, and RMS — the
    windowed loudness/VAD-style features an audio training pipeline
    computes corpus-wide. The DuckDB oracle recomputes every sample from
    the synthesis formula, so a hash match proves each of the ~6k samples
    per doc survives the RIFF encode→decode round trip AND the windowed
    reduction is right.

    Determinism: samples, energies, and peaks are pure int64 (window sums
    ≤ 1e11); RMS ships UNROUNDED — its whole chain (exact int64→double
    casts, one division, one sqrt) is IEEE correctly-rounded, so the raw
    double is bit-identical cross-engine, whereas a decimal rounding step
    would re-introduce the boundary-flake risk the r10 ADVICE documented
    for pca_variance_report (and did, once, at sf0.1 pre-fix). Scale:
    two chained narrow Arrow maps (synth → decode+reduce, numpy reduceat
    inside the kernel, ~4-8 window rows out per doc) with no shuffle —
    the exact shape a real loudness scan takes over a 100 TB audio corpus
    with the synth stage swapped for a binary-column read.
    """
    import numpy as np

    from ..functions.wav import decode_wav

    def feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                k: []
                for k in ("doc_id", "window_idx", "n_in_window", "energy", "peak")
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n = len(s)
                bounds = np.arange(0, n, _AUDIO_WIN)
                sq = s * s
                energies = np.add.reduceat(sq, bounds)
                peaks = np.maximum.reduceat(np.abs(s), bounds)
                counts = np.diff(np.append(bounds, n))
                k = len(bounds)
                rows["doc_id"].extend([doc_id] * k)
                rows["window_idx"].extend(range(k))
                rows["n_in_window"].extend(counts.tolist())
                rows["energy"].extend(energies.tolist())
                rows["peak"].extend(peaks.tolist())
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("n_in_window", T.LongType()),
            T.StructField("energy", T.LongType()),
            T.StructField("peak", T.LongType()),
        ]
    )
    d = load_table(spark, sf_dir, "documents")
    feats = (
        d.select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(synth_audio_batches, _PNG_PAYLOAD_SCHEMA)
        .mapInPandas(feature_batches, schema)
    )
    return feats.withColumn(
        "rms",
        F.sqrt(F.col("energy").cast(_D) / F.col("n_in_window").cast(_D)),
    )
