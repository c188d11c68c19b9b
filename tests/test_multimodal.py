"""Multimodal binary-column plumbing: schema, Arrow batches, stub decode."""

from __future__ import annotations

import hashlib

from datafoundation_multi_source_retail_data_integration_hub_spark.operators import multimodal as MM


def _media_df(spark):
    rows = [
        (1, bytearray(MM.fake_image_bytes(1, 64, 48, 3))),
        (2, bytearray(MM.fake_image_bytes(2, 128, 128, 1))),
        (3, bytearray(b"\x89PNG\r\n not actually decodable")),  # poison blob
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_attach_binary_stats(spark):
    df = MM.attach_binary_stats(_media_df(spark))
    got = {r["media_id"]: r for r in df.collect()}
    raw = MM.fake_image_bytes(1, 64, 48, 3)
    assert got[1]["byte_len"] == len(raw)
    assert got[1]["content_md5"] == hashlib.md5(raw).hexdigest()


def test_extract_image_meta_stub_decode(spark):
    meta = MM.extract_image_meta(_media_df(spark))
    got = {r["media_id"]: r for r in meta.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (64, 48, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (128, 128, 1)
    # poison blob: captured as a row-level failure, not a task failure
    assert got[3]["decode_ok"] is False and got[3]["width"] is None
    assert got[1]["decode_ok"] is True


def test_sample_frames(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "media_id")
    assert MM.sample_frames(df, every_n=10).count() == 10
