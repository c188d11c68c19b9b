"""Stubbed-media resize stage (operators/multimodal.resize_image/resize_media)."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.operators import multimodal as MM


def test_resize_scales_to_fit_preserving_aspect():
    payload = MM.fake_image_bytes(7, 40, 10)
    out = MM.resize_image(payload, 20)
    w, h, c = MM.decode_image_meta(out)
    assert (w, h, c) == (20, 5, 3)  # 40x10 -> fit 20 -> 20x5
    assert len(out) == MM.HEADER_LEN + min(20 * 5 * 3, 256)


def test_resize_never_collapses_to_zero():
    payload = MM.fake_image_bytes(1, 64, 1)
    w, h, _ = MM.decode_image_meta(MM.resize_image(payload, 8))
    assert (w, h) == (8, 1)


def test_resize_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        MM.resize_image(b"\x89PNG\r\n" + b"\x00" * 32, 20)


def test_resize_media_roundtrip(spark):
    dims = spark.createDataFrame(
        [(1, 30, 60), (2, 16, 16)], "media_id LONG, width INT, height INT"
    )
    media = MM.generate_fake_media(dims)
    rows = {r["media_id"]: r for r in MM.resize_media(media, 20).collect()}
    assert rows[1]["width"] == 10 and rows[1]["height"] == 20
    assert rows[2]["width"] == 20 and rows[2]["height"] == 20
    assert all(r["resize_ok"] for r in rows.values())
