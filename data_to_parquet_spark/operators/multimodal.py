"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a clearly
marked STUB (deterministic fake decoder over the payload bytes). Everything
Spark-side is real and is what matters at scale: the binary column schema,
the mapInPandas batch shape (pandas ``bytes`` objects in, struct-typed
metadata out), and the no-shuffle narrow execution.

At 100 TB the payloads come from ``spark.read.format("binaryFile")`` or
parquet binary columns; this operator keeps that exact interface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .base import Registry, load_table

MM = Registry()

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB image decoder — the real one would be e.g. PIL.Image.open.

    Deterministic fake: derives (width, height, checksum) from the bytes so
    tests/oracles are stable. Replace the body with a real codec in a
    container that ships one; the Spark plumbing around it is unchanged.
    """
    n = len(payload)
    checksum = 0
    for i in range(0, n, max(1, n // 64)):  # sample up to 64 positions
        checksum = (checksum * 131 + payload[i]) % (1 << 31)
    return 64 + n % 577, 64 + (n * 7) % 577, checksum


def decode_binary_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, modality, payload) → manifest rows."""
    for pdf in it:
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "modality": pdf["modality"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "checksum": [d[2] for d in decoded],
            }
        )


@MM.register("multimodal_decode_manifest", oracle=None)
def multimodal_decode_manifest(spark, sf_dir):
    """Binary-column pipeline: attach payloads (UTF-8 bytes of the text stand
    in for image bytes), decode via mapInPandas, emit a typed manifest.

    Scale: narrow map over payload partitions; Arrow moves the binary
    batches; no shuffle. (Rows-only check: the decode stub is engine-side.)
    """
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return with_payload.mapInPandas(decode_binary_batches, _MANIFEST_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_offset_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frame_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) → one row per sampled frame.

    STUB video decoder — a real one would use e.g. PyAV to seek keyframes.
    The deterministic fake treats every 256-byte block as a "frame" and
    samples 4 evenly spaced ones, so the Spark-side plumbing (1→N fan-out
    from a binary column, typed frame rows out) is fully exercised.
    """
    for pdf in it:
        out_doc, out_idx, out_off, out_sum = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(1, len(payload) // 256)
            step = max(1, n_frames // 4)
            for i, frame in enumerate(range(0, n_frames, step)[:4]):
                off = frame * 256
                block = payload[off : off + 256]
                out_doc.append(doc_id)
                out_idx.append(i)
                out_off.append(off)
                out_sum.append(sum(block) % (1 << 31))
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "frame_index": out_idx,
                "frame_offset_bytes": out_off,
                "frame_checksum": out_sum,
            }
        )


@MM.register("multimodal_frame_sample", oracle=None)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over opaque video payloads: 1→N row fan-out from a
    binary column via mapInPandas (decode step stubbed, plumbing real).

    Scale: narrow map, Arrow-batched; output rows ≤ 4× input; no shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return with_payload.mapInPandas(sample_frame_batches, _FRAME_SCHEMA)


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
    """
    for pdf in it:
        rows = {k: [] for k in ("doc_id", "orig_width", "orig_height", "width", "height", "resized")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, _ = _fake_decode(payload)
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
