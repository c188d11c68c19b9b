"""Multimodal-column queries: engine-side binary metadata.

The corpus has no media blobs, so the binary column is derived (utf-8
bytes of the document text) — the point is the *binary plumbing*: opaque
payload bytes flowing through codegen'd expressions (length, md5) with
zero Python on the row path. The Arrow-batched decode path
(``operators.multimodal.extract_image_meta``) is exercised in unit tests
with fake payloads since media codecs are stubbed in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_stats, sample_frames
from ..sources.tables import load_tables


def doc_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"), F.col("text").cast("binary").alias("content")
    )
    return attach_binary_stats(media).select("media_id", "byte_len", "content_md5")


DOC_BINARY_STATS_ORACLE = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       md5(text) AS content_md5
FROM documents
"""


def doc_media_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    return (
        sample_frames(media, every_n=10)
        .select("media_id", F.length("content").cast("int").alias("byte_len"))
    )


DOC_MEDIA_SAMPLED_ORACLE = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len
FROM documents WHERE doc_id % 10 = 0
"""


QUERIES = {
    "doc_binary_stats": doc_binary_stats,
    "doc_media_sampled": doc_media_sampled,
}

ORACLES = {
    "doc_binary_stats": DOC_BINARY_STATS_ORACLE,
    "doc_media_sampled": DOC_MEDIA_SAMPLED_ORACLE,
}
