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
    # backend="pure": the oracle pins the deterministic stdlib raster
    # path (bulk pipelines use the default Pillow-preferred "native")
    return resize_media(media, MEDIA_MAX_SIDE, backend="pure")


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


# AV container parameters derived from the id — the oracle recomputes
# them arithmetically; the Spark side derives metadata from REAL
# container bytes (RIFF chunk walk / ISO-BMFF box walk), so a parser
# or builder bug shows up as an oracle mismatch
_SR = "8000 + (media_id % 5) * 2000"
_NS = "200 + media_id % 400"
# dialect-neutral (no // vs DIV): even ids split 1ch/2ch on id % 4
_CH = "CASE WHEN media_id % 4 < 2 THEN 1 ELSE 2 END"
_DUR = "500 + (media_id * 37) % 9500"


def doc_av_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video header metadata over opaque binary payloads: even
    ids become complete PCM WAV files, odd ids minimal ISO-BMFF MP4s
    (ftyp + moov(mvhd, trak(tkhd))); ``extract_av_meta`` walks the
    RIFF chunks / BMFF boxes to recover duration, sample rate/channels
    (audio) and track dims (video). Pure-parser tier — no codec
    dependency, runs at scan speed on any corpus size."""
    from ..operators.multimodal import extract_av_meta, generate_fake_av

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    params = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("wav")).otherwise("mp4").alias("kind"),
        F.expr(_SR).cast("int").alias("sample_rate"),
        F.expr(_NS).cast("int").alias("n_samples"),
        F.expr(_CH).cast("int").alias("channels"),
        F.expr(_DUR).cast("int").alias("duration_ms"),
        F.expr(_W).cast("int").alias("width"),
        F.expr(_H).cast("int").alias("height"),
    )
    return extract_av_meta(generate_fake_av(params))


# byte lengths are structural: WAV = 44-byte header + n_samples *
# channels * 2 PCM bytes; the minimal MP4 is a fixed 244-byte box tree.
# WAV duration floors exactly like the parser: (data_len*1000) //
# byte_rate == (n_samples*1000) // sample_rate (common block_align
# factor cancels under floor division)
DOC_AV_META_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST(CASE WHEN doc_id % 2 = 0
                 THEN 44 + ({_NS.replace('media_id', 'doc_id')}) * ({_CH.replace('media_id', 'doc_id')}) * 2
                 ELSE 244 END AS INTEGER) AS byte_len,
       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS container,
       CAST(CASE WHEN doc_id % 2 = 0
                 THEN (({_NS.replace('media_id', 'doc_id')}) * 1000) // ({_SR.replace('media_id', 'doc_id')})
                 ELSE {_DUR.replace('media_id', 'doc_id')} END AS INTEGER) AS duration_ms,
       CAST(CASE WHEN doc_id % 2 = 0 THEN {_SR.replace('media_id', 'doc_id')} END AS INTEGER) AS sample_rate,
       CAST(CASE WHEN doc_id % 2 = 0 THEN {_CH.replace('media_id', 'doc_id')} END AS INTEGER) AS channels,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + doc_id % 48 END AS INTEGER) AS width,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + (doc_id * 7) % 48 END AS INTEGER) AS height,
       TRUE AS decode_ok
FROM documents
"""


QUERIES = {
    "doc_binary_stats": doc_binary_stats,
    "doc_media_sampled": doc_media_sampled,
    "doc_media_resized": doc_media_resized,
    "doc_av_meta": doc_av_meta,
}

ORACLES = {
    "doc_binary_stats": DOC_BINARY_STATS_ORACLE,
    "doc_media_sampled": DOC_MEDIA_SAMPLED_ORACLE,
    "doc_media_resized": DOC_MEDIA_RESIZED_ORACLE,
    "doc_av_meta": DOC_AV_META_ORACLE,
}
