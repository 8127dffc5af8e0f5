"""Codec escape hatch: the multimodal stages run with a REAL codec when one
is importable and with the deterministic byte-level fake when not.

This container ships no PIL, so the fallback branch is the live one; the
codec branch is exercised by injecting a PIL-shaped stand-in. The stand-in
is built from SimpleNamespace + lambdas (cloudpickle serializes those by
VALUE into the Python workers — a class defined in this test module would
be pickled by reference and fail to import worker-side).
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from spotify_etl_pipeline_spark.operators import multimodal as M
from spotify_etl_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    resize_images,
)
from spotify_etl_pipeline_spark.schemas import load_fixture


def _fake_codec():
    """PIL.Image-shaped module: open(BytesIO) -> img; img.resize((w, h))
    -> img2; img2.tobytes() tiles the payload to exactly w*h bytes."""

    def open_(bio):
        data = bio.read() or b"\x00"

        def resize(wh):
            w, h = wh
            return SimpleNamespace(
                tobytes=lambda: (data * (w * h // len(data) + 1))[: w * h]
            )

        return SimpleNamespace(resize=resize)

    return SimpleNamespace(open=open_)


def _payloads(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents").limit(20)
    return attach_binary_payload(docs)


def test_decode_media_raises_without_codec():
    if M.PIL_IMAGE is not None:
        pytest.skip("a real PIL is installed here; fallback branch inactive")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG...")


def test_resize_fallback_truncates_payload(spark, sf_dir):
    """codec=False forces the fake regardless of an installed PIL — the
    mode the oracle-checked catalog query pins."""
    rows = resize_images(
        _payloads(spark, sf_dir), width=8, height=8, codec=False
    ).collect()
    assert rows and all(r.width == 8 and r.height == 8 for r in rows)
    assert all(0 <= r.n_bytes <= 64 for r in rows)


def test_resize_with_injected_codec_decodes_on_workers(spark, sf_dir):
    """The codec branch must run inside mapInPandas workers end-to-end:
    every output row reports the decoded-and-resized byte count (w*h from
    the tiling stand-in), not the fallback's truncation."""
    rows = resize_images(
        _payloads(spark, sf_dir), width=8, height=8, codec=_fake_codec()
    ).collect()
    assert rows and all(r.n_bytes == 64 for r in rows)
