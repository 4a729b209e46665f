"""Multimodal plumbing: the PIL gate must raise cleanly (the real
decoder is deliberately absent in this container), and the
mapInPandas Arrow path must agree with the scalar stub kernel."""

from __future__ import annotations

import pytest

from grader_etl_spark.operators.multimodal import (
    _HAVE_PIL,
    assets_from_documents,
    decode_assets,
    decode_image,
    fake_decode_meta,
)


@pytest.mark.skipif(_HAVE_PIL, reason="PIL present: the real decoder path applies")
def test_decode_image_gate_raises_cleanly():
    with pytest.raises(NotImplementedError, match="requires PIL"):
        decode_image(b"\x89PNG\r\n\x1a\n")


@pytest.mark.skipif(not _HAVE_PIL, reason="PIL absent in this container")
def test_decode_image_real_path():
    # If a future container ships PIL, the gate must open and decode a
    # 1x1 PNG rather than raise.
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (1, 1)).save(buf, format="PNG")
    img = decode_image(buf.getvalue())
    assert img.size == (1, 1)


def test_decode_assets_matches_scalar_kernel(spark):
    docs = spark.createDataFrame(
        [(1, "short"), (2, "a much longer payload body " * 9)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decode_assets(assets_from_documents(docs)).collect()}
    for doc_id, text in ((1, "short"), (2, "a much longer payload body " * 9)):
        n, w, h = fake_decode_meta(text.encode())
        r = got[doc_id]
        assert (r["byte_len"], r["width"], r["height"]) == (n, w, h)
