"""Multimodal column plumbing (SURVEY.md X5 + driver mandate).

Media (image/audio/video) are opaque ``binary`` columns travelling next to
typed metadata structs. The Spark-side machinery — schema, partition-safe
Arrow batching, ``mapInPandas`` UDF signatures — is real and tested; the
actual codec step is stubbed (image/audio libs are not in this container)
behind ``decode_stub`` with a deterministic fake so oracle checks stay exact.

Scale notes: media bytes stay in executor-side Arrow batches end-to-end —
never collected, never exploded per-pixel. ``mapInPandas`` streams batches,
so memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of blob sizes; feature extraction is embarrassingly parallel with
zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id LONG, n_bytes INT, first_byte INT, checksum16 LONG, media_type STRING"
)


def attach_binary_payload(df: DataFrame) -> DataFrame:
    """Bundle a binary payload + typed metadata struct onto each document.

    Here the payload is the utf-8 text bytes (the container has no media
    files); in production this column would come straight from
    ``spark.read.format("binaryFile")`` or a parquet BLOB column.
    """
    return df.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.col("n_chars").cast("int").alias("n_chars"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_media(payload: bytes) -> object:
    """Codec boundary — REAL decode goes here (PIL/libav/ffmpeg).

    Deliberately stubbed: the execution container ships no media libraries.
    The Spark plumbing around this call (Arrow batching, schema, partition
    parallelism) is production-shaped and tested with the deterministic fake
    below.
    """
    raise NotImplementedError(
        "media decode requires PIL/av — not available in this container; "
        "extract_features uses a deterministic byte-level fake instead"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    The 'features' are deterministic byte statistics (length, first byte,
    16-bit additive checksum of the first 16 bytes) standing in for a real
    decoder's output, so the pipeline is exact and oracle-checkable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "checksum16": payloads.map(
                        lambda b: sum(b[:16]) % 65536
                    ).astype("int64"),
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id LONG, width INT, height INT, n_bytes INT"
FRAME_SCHEMA = "doc_id LONG, frame_idx INT, frame_offset INT, frame_bytes BINARY"


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image-resize stage shape over mapInPandas.

    A real deployment calls PIL inside the batch loop (see
    :func:`decode_media` for why that is stubbed); the deterministic fake
    'resizes' by truncating the payload to width*height bytes, which keeps
    the Spark contract — per-batch Arrow transfer, bounded memory, schema
    with target dimensions — fully exercised and testable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": pdf["payload"]
                    .map(lambda b: min(len(b), target))
                    .astype("int32"),
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling stage shape: one input row fans out to ≤
    ``max_frames`` output rows (1:N mapInPandas — the part that cannot be
    a scalar UDF). The fake 'frame' is an 8-byte slice at each stride
    offset; a real decoder emits keyframes at timestamp strides.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # ceil(len/stride): exact multiples must NOT emit a phantom
                # empty frame at offset == len; empty payloads get one frame
                n_frames = min(
                    max_frames, max(-(-len(payload) // every_n_bytes), 1)
                )
                for i in range(n_frames):
                    off = i * every_n_bytes
                    rows.append((doc_id, i, off, bytes(payload[off : off + 8])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_bytes"]
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
