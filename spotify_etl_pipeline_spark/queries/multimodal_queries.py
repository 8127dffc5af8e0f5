"""Multimodal-column queries (SURVEY.md X5): binary payload + metadata
struct + Arrow-batched feature extraction. The UDF output is deterministic
byte arithmetic so DuckDB can verify the full mapInPandas path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_binary_payload, extract_features
from ..schemas import load_fixture
from .catalog import register


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_byte,
           CAST(list_sum(list_transform(range(least(16, length(text))),
                i -> ascii(substring(text, CAST(i + 1 AS INTEGER), 1))))
                % 65536 AS BIGINT) AS checksum16,
           'text/plain' AS media_type
    FROM documents
    """,
    survey="X5",
    doc="Binary payload + metadata struct → mapInPandas feature extraction "
    "(deterministic byte stats standing in for the stubbed media decoder).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(docs))


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(64 AS INTEGER) AS width,
           CAST(64 AS INTEGER) AS height,
           CAST(LEAST(length(text), 4096) AS INTEGER) AS n_bytes
    FROM documents
    """,
    survey="X5",
    doc="Image-resize stage shape (mapInPandas, Arrow-batched; deterministic "
    "fake for the stubbed codec — see operators/multimodal.py).",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_binary_payload, resize_images

    docs = load_fixture(spark, sf_dir, "documents")
    # codec=False pins the deterministic fake: the payloads are utf-8 text
    # (never decodable images) and the oracle above hard-codes the
    # truncation semantics — auto-detecting an installed PIL would crash
    # the workers AND diverge from the oracle.
    return resize_images(attach_binary_payload(docs), width=64, height=64, codec=False)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT d.doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(i * 64 AS INTEGER) AS frame_offset,
           substring(d.text, CAST(i * 64 + 1 AS INTEGER), 8) AS frame_str
    FROM documents d,
         (SELECT unnest(range(4)) AS i) idx
    WHERE i < LEAST(4, GREATEST(CAST(CEIL(length(d.text) / 64.0) AS INTEGER), 1))
    """,
    survey="X5",
    doc="Video frame-sampling shape: 1:N mapInPandas fan-out (<=4 frames per "
    "payload at 64-byte strides); frames decoded to strings for the oracle "
    "(payloads are ASCII so byte and char offsets agree).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import attach_binary_payload, sample_frames

    docs = load_fixture(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(docs), every_n_bytes=64, max_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_offset",
        F.decode("frame_bytes", "utf-8").alias("frame_str"),
    )
