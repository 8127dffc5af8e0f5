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
