"""Multimodal column plumbing (SURVEY.md X5 + driver mandate).

Media (image/audio/video) are opaque ``binary`` columns travelling next to
typed metadata structs. The Spark-side machinery — schema, partition-safe
Arrow batching, ``mapInPandas`` UDF signatures — is real and tested. The
codec step uses PIL when importable and otherwise falls back to a
deterministic byte-level fake (image/audio libs are not in this container),
so oracle checks stay exact in either environment.

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


def _try_import_pil():
    """Runtime probe for a real image codec. Resolved once per Python
    worker (module import), not per row."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


PIL_IMAGE = _try_import_pil()


def decode_media(payload: bytes) -> object:
    """Codec boundary: real decode when a codec is installed, declared
    failure when not.

    When PIL is importable the payload is opened as an image and returned
    decoded; otherwise this raises — the execution container ships no media
    libraries, and the mapInPandas stages fall back to the deterministic
    byte-level fake so the Spark plumbing (Arrow batching, schema, partition
    parallelism) stays production-shaped, tested, and oracle-exact. Both
    modes are covered by tests/test_multimodal_codec.py (fake mode in this
    container; the codec branch via an injected stand-in).
    """
    if PIL_IMAGE is not None:
        import io

        return PIL_IMAGE.open(io.BytesIO(payload))
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


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, codec=None
) -> DataFrame:
    """Image-resize stage over mapInPandas — real codec when one exists.

    ``codec`` selects the decode behavior:

    - ``None`` (default): PIL when importable, else the deterministic fake
      that 'resizes' by truncating the payload to width*height bytes;
    - ``False``: force the fake — what the oracle-checked catalog query
      pins, since its payloads are utf-8 text (never decodable images) and
      its DuckDB oracle hard-codes the truncation semantics;
    - any PIL.Image-shaped module (``open(BytesIO) →`` object with
      ``resize((w, h))``): used as the decoder.

    The codec rides into the Python workers as part of the pickled
    closure — a module-global would be re-imported worker-side and
    silently ignore an injected codec. Either mode keeps the Spark
    contract identical: per-batch Arrow transfer, bounded memory, schema
    with target dimensions. Both branches are tested in
    tests/test_multimodal_codec.py (the codec branch via an injected fake).
    """
    if codec is None:
        codec = PIL_IMAGE

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        target = width * height

        def decoded_size(b: bytes) -> int:
            img = codec.open(io.BytesIO(b)).resize((width, height))
            # dims × bands, not len(tobytes()): materializing the full
            # pixel buffer per row just to measure it is an avoidable
            # allocation on the hot path
            if hasattr(img, "getbands"):
                return width * height * len(img.getbands())
            return len(img.tobytes())

        for pdf in it:
            if codec:
                n_bytes = pdf["payload"].map(decoded_size)
            else:
                n_bytes = pdf["payload"].map(lambda b: min(len(b), target))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": n_bytes.astype("int32"),
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
