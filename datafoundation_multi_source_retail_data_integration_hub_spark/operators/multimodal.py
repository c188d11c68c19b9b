"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The Spark-side contract is real and tested end-to-end: schema, batch
shape, partitioning, and UDF signatures all work on binary payloads. The
actual media decode is STUBBED (the image/audio libraries are not in this
container): ``decode_image_meta`` parses only deterministic fake headers
produced by ``fake_image_bytes`` and raises ``NotImplementedError`` for
real formats. Swapping the stub for Pillow/ffmpeg changes one function —
none of the Spark plumbing.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``mapInPandas`` streams Arrow record batches, so peak memory per
task is one batch (tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
for large blobs); decode parallelism == partition count of the scan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fake header: magic 'FIMG' + u16 width + u16 height + u8 channels
_FAKE_MAGIC = b"FIMG"
_HEADER = ">4sHHB"

MEDIA_META_SCHEMA = (
    "media_id long, byte_len int, content_md5 string, "
    "width int, height int, channels int, decode_ok boolean"
)


def fake_image_bytes(media_id: int, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake image payload (header + pseudo-pixels)."""
    header = struct.pack(_HEADER, _FAKE_MAGIC, width, height, channels)
    n = min(width * height * channels, 256)
    body = bytes((media_id * 31 + i * 7) % 256 for i in range(n))
    return header + body


def decode_image_meta(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: parse the fake header. A real deployment replaces this
    with Pillow/libvips; anything that is not a fake payload raises."""
    if payload[:4] != _FAKE_MAGIC:
        raise NotImplementedError(
            "real image decoding is stubbed in this environment"
        )
    _, w, h, c = struct.unpack(_HEADER, payload[: struct.calcsize(_HEADER)])
    return w, h, c


def attach_binary_stats(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Cheap engine-side metadata: byte length + md5 — no Python, pure
    codegen'd expressions; runs at scan speed on any corpus size."""
    return df.withColumn("byte_len", F.length(F.col(binary_col)).cast("int")).withColumn(
        "content_md5", F.md5(F.col(binary_col))
    )


def extract_image_meta(
    df: DataFrame, id_col: str = "media_id", binary_col: str = "content"
) -> DataFrame:
    """Arrow-batched decode -> metadata row per media item.

    ``mapInPandas``: each task consumes an iterator of pandas batches, so
    memory stays bounded by the Arrow batch size regardless of corpus
    scale. Decode failures are captured per row (``decode_ok=false``), not
    task failures — a poison blob cannot kill the job.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf[id_col].astype("int64"),
                "byte_len": pdf[binary_col].map(len).astype("int32"),
                "content_md5": pdf[binary_col].map(
                    lambda b: __import__("hashlib").md5(b).hexdigest()
                ),
            }
            dims = []
            for payload in pdf[binary_col]:
                try:
                    dims.append(decode_image_meta(bytes(payload)) + (True,))
                except (NotImplementedError, struct.error, IndexError):
                    dims.append((None, None, None, False))
            out["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            out["channels"] = pd.array([d[2] for d in dims], dtype="Int32")
            out["decode_ok"] = [d[3] for d in dims]
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int,
    id_col: str = "media_id",
) -> DataFrame:
    """Deterministic frame/row sampling: keep ids where id % every_n == 0 —
    the partition-local, shuffle-free sampling pattern used to thin video
    frames or huge media corpora before expensive decode."""
    return df.filter((F.col(id_col) % every_n) == 0)


RESIZED_META_SCHEMA = (
    "media_id long, src_width int, src_height int, "
    "width int, height int, byte_len int, resize_ok boolean"
)

HEADER_LEN = struct.calcsize(_HEADER)
_BODY_CAP = 256  # fake_image_bytes caps pseudo-pixels at 256 bytes


def resize_image(payload: bytes, max_side: int) -> bytes:
    """STUB resize on the fake format: integer scale-to-fit ``max_side``
    preserving aspect (floor division — exactly portable arithmetic),
    header rewritten, body nearest-neighbor-subsampled from the capped
    pseudo-pixel array. A real deployment swaps this one function for
    Pillow/libvips ``thumbnail``; the Spark plumbing is unchanged."""
    w, h, c = decode_image_meta(payload)
    m = max(w, h)
    dw = max(1, (w * max_side) // m)
    dh = max(1, (h * max_side) // m)
    body = payload[HEADER_LEN:]
    n_dst = min(dw * dh * c, _BODY_CAP)
    n_src = len(body)
    out = bytes(body[(i * n_src) // n_dst] for i in range(n_dst)) if n_src else b""
    return struct.pack(_HEADER, _FAKE_MAGIC, dw, dh, c) + out


def resize_media(df: DataFrame, max_side: int) -> DataFrame:
    """Arrow-batched resize stage: per row build/accept the payload,
    resize, RE-DECODE the result (the round-trip check a pipeline wants
    before shipping thumbnails), and emit source + target metadata.
    Expects columns (media_id, content); one Python batch per Arrow
    record batch — same memory posture as ``extract_image_meta``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [], "src_width": [], "src_height": [],
                "width": [], "height": [], "byte_len": [], "resize_ok": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                sw, sh, sc = decode_image_meta(bytes(payload))
                resized = resize_image(bytes(payload), max_side)
                try:
                    dw, dh, dc = decode_image_meta(resized)
                    ok = dc == sc and max(dw, dh) <= max_side
                except (NotImplementedError, struct.error):
                    dw = dh = 0
                    ok = False
                out["media_id"].append(mid)
                out["src_width"].append(sw)
                out["src_height"].append(sh)
                out["width"].append(dw)
                out["height"].append(dh)
                out["byte_len"].append(len(resized))
                out["resize_ok"].append(ok)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=RESIZED_META_SCHEMA)


def generate_fake_media(df: DataFrame) -> DataFrame:
    """Arrow-batched fake-media generator for tests/demos: (media_id,
    width, height) -> (media_id, content) with deterministic payloads.
    Stands in for the binary scan of a real media corpus."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        fake_image_bytes(int(m), int(w), int(h))
                        for m, w, h in zip(
                            pdf["media_id"], pdf["width"], pdf["height"]
                        )
                    ],
                }
            )

    return df.mapInPandas(batches, schema="media_id long, content binary")
