"""Audio/video header-metadata tier (VERDICT r09 directive 5).

WAV/RIFF and MP4/ISO-BMFF containers built spec-valid byte-by-byte,
parsed back by the pure stdlib chunk/box walkers — same zero-dependency
tier as the image header parsers. Poison blobs must degrade to
``decode_ok=false`` data rows through the Spark stage, never task
failures.
"""

from __future__ import annotations

import struct

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.operators import (
    multimodal as MM,
)


def test_wav_roundtrip_mono():
    p = MM.fake_wav_bytes(3, 16000, 320, 1)
    assert MM._wav_meta(p) == (20, 16000, 1)  # 320 samples @16k = 20 ms
    assert len(p) == 44 + 320 * 2


def test_wav_roundtrip_stereo_floor():
    p = MM.fake_wav_bytes(9, 11025, 333, 2)
    # (333 * 1000) // 11025 == 30 — floor semantics, block_align cancels
    assert MM._wav_meta(p) == (30, 11025, 2)


def test_wav_chunk_order_independent():
    # RIFF allows chunks in any order: move data before fmt
    p = MM.fake_wav_bytes(1, 8000, 100, 1)
    fmt_chunk = p[12 : 12 + 8 + 16]
    data_chunk = p[12 + 8 + 16 :]
    reordered = p[:12] + data_chunk + fmt_chunk
    assert MM._wav_meta(reordered) == MM._wav_meta(p)


def test_wav_odd_chunk_padding():
    # an odd-sized chunk pads to even per the RIFF spec; the walker must
    # step over the pad byte to find the following data chunk
    p = MM.fake_wav_bytes(1, 8000, 100, 1)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 -> pad to 4
    injected = p[:12] + junk + p[12:]
    assert MM._wav_meta(injected) == MM._wav_meta(p)


def test_wav_malformed():
    with pytest.raises(ValueError):
        MM._wav_meta(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data
    with pytest.raises(ValueError):
        MM._wav_meta(b"RIFX" + b"\x00" * 40)


def test_mp4_roundtrip():
    p = MM.fake_mp4_bytes(7, 4321, 640, 480)
    assert MM._mp4_meta(p) == (4321, 640, 480)


def test_mp4_version1_and_largesize():
    # hand-build a v1 mvhd (64-bit times) inside a largesize moov
    mvhd = (
        struct.pack(">B3x", 1)
        + struct.pack(">QQIQ", 0, 0, 600, 1200)  # ts=600, dur=1200 -> 2000ms
        + b"\x00" * 80
    )
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(mvhd_box)) + mvhd_box
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
    assert MM._mp4_meta(ftyp + moov)[0] == 2000


def test_mp4_malformed():
    with pytest.raises(ValueError):
        MM._mp4_meta(struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4)  # no moov
    with pytest.raises(ValueError):
        # box claims to overrun the file
        MM._mp4_meta(struct.pack(">I", 999) + b"moov" + b"\x00" * 8)


def test_extract_av_meta_mixed_and_poison(spark):
    rows = [
        (1, bytearray(MM.fake_wav_bytes(1, 8000, 400, 2))),
        (2, bytearray(MM.fake_mp4_bytes(2, 1500, 32, 24))),
        (3, bytearray(b"RIFF\xff\xff\xff\xffWAVEjunk")),  # poison wav
        (4, bytearray(b"\x00\x00\x00\x0cftypisom")),  # mp4 sig, no moov
        (5, bytearray(b"not-a-container")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in MM.extract_av_meta(df).collect()}
    assert got[1]["container"] == "wav" and got[1]["decode_ok"]
    assert (got[1]["duration_ms"], got[1]["sample_rate"], got[1]["channels"]) == (
        50,
        8000,
        2,
    )
    assert got[1]["width"] is None
    assert got[2]["container"] == "mp4" and got[2]["decode_ok"]
    assert (got[2]["duration_ms"], got[2]["width"], got[2]["height"]) == (1500, 32, 24)
    assert got[2]["sample_rate"] is None
    # poison rows: container sig recognized but decode fails -> data row
    assert got[3]["container"] == "wav" and not got[3]["decode_ok"]
    assert got[4]["container"] == "mp4" and not got[4]["decode_ok"]
    assert got[5]["container"] is None and not got[5]["decode_ok"]
    assert got[5]["byte_len"] == len(b"not-a-container")


def _mvhd_v0(timescale: int, duration: int) -> bytes:
    return (
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + b"\x00" * 80
    )


def _tkhd_v0(width: int, height: int) -> bytes:
    return (
        struct.pack(">B3x", 0)
        + b"\x00" * 72
        + struct.pack(">II", width << 16, height << 16)
    )


def test_mp4_audio_first_trak_skipped_for_dims():
    # real MP4s often mux the audio track first; its tkhd carries 0x0
    # dims per spec — the walker must keep scanning to the video trak
    moov = (
        MM._box(b"mvhd", _mvhd_v0(1000, 2500))
        + MM._box(b"trak", MM._box(b"tkhd", _tkhd_v0(0, 0)))  # audio
        + MM._box(b"trak", MM._box(b"tkhd", _tkhd_v0(640, 480)))  # video
    )
    p = MM._box(b"ftyp", b"isom" + b"\x00" * 8) + MM._box(b"moov", moov)
    assert MM._mp4_meta(p) == (2500, 640, 480)


def test_mp4_audio_only_reports_null_dims():
    moov = MM._box(b"mvhd", _mvhd_v0(1000, 900)) + MM._box(
        b"trak", MM._box(b"tkhd", _tkhd_v0(0, 0))
    )
    p = MM._box(b"ftyp", b"isom" + b"\x00" * 8) + MM._box(b"moov", moov)
    assert MM._mp4_meta(p) == (900, None, None)


def test_av_int32_overflow_is_poison_row_not_task_failure(spark):
    # hostile-but-parseable containers whose metadata exceeds Int32:
    # without the per-row bound check, pd.array(dtype="Int32") raises
    # OUTSIDE the try and kills the whole Arrow batch task
    wav_sr = bytearray(MM.fake_wav_bytes(1, 8000, 40, 1))
    # fmt chunk starts at 12+8; sample_rate is its 5th byte (<HHI...)
    wav_sr[12 + 8 + 4 : 12 + 8 + 8] = struct.pack("<I", 0xFFFFFFFF)
    moov = MM._box(b"mvhd", _mvhd_v0(1, 0xFFFFFFFF))  # 4.29e12 ms
    mp4_dur = MM._box(b"ftyp", b"isom" + b"\x00" * 8) + MM._box(b"moov", moov)
    rows = [
        (1, wav_sr),
        (2, bytearray(mp4_dur)),
        (3, bytearray(MM.fake_wav_bytes(3, 8000, 40, 1))),  # healthy row
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in MM.extract_av_meta(df).collect()}
    assert not got[1]["decode_ok"] and got[1]["sample_rate"] is None
    assert not got[2]["decode_ok"] and got[2]["duration_ms"] is None
    assert got[3]["decode_ok"] and got[3]["sample_rate"] == 8000
