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
