"""Multimodal columns: opaque binary payloads + typed metadata
(BASELINE.json north star).

Design: media travels as an opaque ``binary`` column with typed
metadata columns beside it; decode / feature-extraction runs in
Arrow-batched ``mapInPandas`` so bytes move columnar (never pickled
row-at-a-time) and the pipeline shape (schema, partitioning, batch
size) is real even where the codec is stubbed.

The container has no image/audio codecs, so the decode kernel is a
clearly marked STUB: :func:`fake_decode_features` computes
deterministic byte-level features (length, checksum, head bytes) —
the Spark-side plumbing (explicit output schema, per-batch vectorized
numpy work, ``maxRecordsPerBatch`` sizing) is exactly what a real
PIL/ffmpeg kernel would use; swap `_decode_batch` and keep the plan.

Scale notes: payload bytes dominate I/O — the operators keep binary
columns OUT of shuffles (features are extracted before any
aggregation; joins carry ids, not blobs). ``repartition`` before
mapInPandas controls decode parallelism independent of file layout.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMATS = ["png", "jpeg", "wav"]

DECODE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("byte_len", LongType()),
        StructField("checksum", LongType()),
        StructField("head_byte", LongType()),
    ]
)


def attach_binary(documents: DataFrame) -> DataFrame:
    """Simulate a media table: payload = utf-8 bytes of the text
    (deterministic stand-in for image/audio bytes), with typed
    metadata (format tag, payload length)."""
    payload = F.encode(F.col("text"), "UTF-8")
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in FORMATS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        "doc_id",
        fmt.alias("media_format"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("payload_len"),
    )


def _decode_batch(pdf):
    """STUB decode kernel — replace with a real codec (PIL/librosa/
    ffmpeg) in production. Deterministic byte-level features only."""
    import numpy as np
    import pandas as pd

    payloads = pdf["payload"]
    byte_len = payloads.map(len)
    checksum = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) % 65536)
    head = payloads.map(lambda b: int(b[0]) if len(b) else -1)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_format": pdf["media_format"],
            "byte_len": byte_len.astype("int64"),
            "checksum": checksum.astype("int64"),
            "head_byte": head.astype("int64"),
        }
    )


def decode_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _decode_batch(pdf)

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=DECODE_FEATURES_SCHEMA)


def real_decode_placeholder(media: DataFrame) -> DataFrame:
    """Where a real codec would mount. Raises by design — the
    container ships no media libraries (environment constraint)."""
    raise NotImplementedError(
        "real image/audio decode requires codec libraries not present "
        "in this environment; use decode_features (stub kernel) or "
        "swap _decode_batch for a codec-backed kernel"
    )
