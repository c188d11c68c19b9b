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


MEDIA_MAX_SIDE = 20
# fake media dims derived from the id — the oracle recomputes them
_W = "16 + media_id % 48"
_H = "16 + (media_id * 7) % 48"


def doc_media_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full stubbed-media pipeline: deterministic fake payloads
    generated per doc id -> Arrow-batched resize to fit MEDIA_MAX_SIDE
    (integer scale-to-fit, floor division) -> round-trip re-decode of
    the resized header. The dimension/length arithmetic is exactly
    portable, so the oracle recomputes the whole thing from the id;
    the booleans gate the decode round-trip."""
    from ..operators.multimodal import generate_fake_media, resize_media

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    dims = docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(_W).alias("width"),
        F.expr(_H).alias("height"),
    )
    media = generate_fake_media(dims)
    return resize_media(media, MEDIA_MAX_SIDE)


DOC_MEDIA_RESIZED_ORACLE = f"""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST({_W} AS INTEGER) AS sw,
         CAST({_H} AS INTEGER) AS sh
  FROM documents
),
r AS (
  SELECT media_id, sw, sh,
         CAST(greatest(1, (sw * {MEDIA_MAX_SIDE}) // greatest(sw, sh))
              AS INTEGER) AS dw,
         CAST(greatest(1, (sh * {MEDIA_MAX_SIDE}) // greatest(sw, sh))
              AS INTEGER) AS dh
  FROM dims
)
SELECT media_id,
       sw AS src_width,
       sh AS src_height,
       dw AS width,
       dh AS height,
       CAST(9 + least(dw * dh * 3, 256) AS INTEGER) AS byte_len,
       TRUE AS resize_ok
FROM r
"""


QUERIES = {
    "doc_binary_stats": doc_binary_stats,
    "doc_media_sampled": doc_media_sampled,
    "doc_media_resized": doc_media_resized,
}

ORACLES = {
    "doc_binary_stats": DOC_BINARY_STATS_ORACLE,
    "doc_media_sampled": DOC_MEDIA_SAMPLED_ORACLE,
    "doc_media_resized": DOC_MEDIA_RESIZED_ORACLE,
}
