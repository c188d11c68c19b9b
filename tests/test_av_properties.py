"""Property tests for the AV container builders/parsers.

Two families, mirroring tests/test_codec_properties.py for the raster
codecs:

1. build -> parse is the identity over the builders' full parameter
   domains (not just the doc_av_meta rotation's arithmetic slices);
2. hostile-input containment: a parser fed a mutated or random blob
   must either return normally or raise ONLY from the exception set
   ``extract_av_meta`` catches (ValueError, struct.error, IndexError,
   OverflowError, NotImplementedError) — anything else (KeyError,
   TypeError, ZeroDivisionError, RecursionError, ...) would escape the
   per-row try and kill a Spark task instead of degrading to a
   ``decode_ok=false`` row.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from datafoundation_multi_source_retail_data_integration_hub_spark.operators import (
    multimodal as MM,
)

from ._fuzz import mutate

_ADTS_VALID_RATES = tuple(r for r in MM._ADTS_RATES if r is not None)
_MP3_RATES = tuple(MM._MP3_RATE_IDX)
_MP3_BITRATES = tuple(k * 1000 for k in MM._MP3_BITRATE_IDX)

# extract_av_meta's per-row catch list — imported, not copied, so the
# test contract cannot drift from production
_CAUGHT = MM.AV_META_CAUGHT


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_wav_build_parse_identity(data):
    sr = data.draw(st.integers(1, 192_000))
    ns = data.draw(st.integers(0, 4_000))
    ch = data.draw(st.integers(1, 8))
    mid = data.draw(st.integers(0, 2**31))
    dur, got_sr, got_ch = MM._wav_meta(MM.fake_wav_bytes(mid, sr, ns, ch))
    # block_align cancels under floor: (ns*ba*1000)//(sr*ba) == ns*1000//sr
    assert (dur, got_sr, got_ch) == ((ns * 1000) // sr, sr, ch)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_mp4_build_parse_identity(data):
    dur = data.draw(st.integers(0, 10_000_000))
    w = data.draw(st.integers(1, 65_535))
    h = data.draw(st.integers(1, 65_535))
    mid = data.draw(st.integers(0, 2**31))
    assert MM._mp4_meta(MM.fake_mp4_bytes(mid, dur, w, h)) == (dur, w, h)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_mp3_build_parse_identity(data):
    sr = data.draw(st.sampled_from(_MP3_RATES))
    br = data.draw(st.sampled_from(_MP3_BITRATES))
    nf = data.draw(st.integers(1, 24))
    ch = data.draw(st.sampled_from([1, 2]))
    pad = data.draw(st.integers(0, 300))
    mid = data.draw(st.integers(0, 2**31))
    p = MM.fake_mp3_bytes(mid, sr, br, nf, ch, pad)
    assert MM._mp3_meta(p) == ((nf * 1152 * 1000) // sr, sr, ch)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_adts_build_parse_identity(data):
    sr = data.draw(st.sampled_from(_ADTS_VALID_RATES))
    nf = data.draw(st.integers(1, 24))
    cfg = data.draw(st.integers(1, 7))  # 0 = PCE-carried (count unknown)
    pl = data.draw(st.integers(1, 512))
    mid = data.draw(st.integers(0, 2**31))
    p = MM.fake_adts_bytes(mid, sr, nf, cfg, pl)
    assert len(p) == nf * (7 + pl)
    dur, got_sr, got_ch = MM._adts_meta(p)
    assert (dur, got_sr) == ((nf * 1024 * 1000) // sr, sr)
    assert got_ch == MM._ADTS_CHANNEL_COUNT[cfg]


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_ogg_build_parse_identity(data):
    sr = data.draw(st.integers(1, 192_000))
    ns = data.draw(st.integers(0, 10_000_000))
    ch = data.draw(st.integers(1, 255))
    mid = data.draw(st.integers(0, 2**31))
    p = MM.fake_ogg_bytes(mid, sr, ns, ch)
    assert MM._ogg_meta(p) == ((ns * 1000) // sr, sr, ch)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_mkv_build_parse_identity(data):
    dur = data.draw(st.integers(0, 10_000_000))
    w = data.draw(st.integers(1, 65_535))
    h = data.draw(st.integers(1, 65_535))
    sr = data.draw(st.integers(1, 1_000_000))
    ch = data.draw(st.integers(1, 255))
    mid = data.draw(st.integers(0, 2**31))
    p = MM.fake_mkv_bytes(mid, dur, w, h, sr, ch)
    assert MM._mkv_meta(p) == (dur, sr, ch, w, h)
    # the doc_av_meta DuckDB oracle hardcodes byte_len = 84 for mkv
    # rows; pin the container size here so a layout change surfaces as
    # a unit failure, not a driver-time oracle mismatch
    assert len(p) == 84


def _builders():
    return st.sampled_from(
        [
            lambda mid: MM.fake_wav_bytes(mid, 16000, 100, 2),
            lambda mid: MM.fake_mp4_bytes(mid, 1234, 32, 24),
            lambda mid: MM.fake_mp3_bytes(mid, 44100, 128000, 3, 2, 17),
            lambda mid: MM.fake_ogg_bytes(mid, 8000, 500, 1),
            lambda mid: MM.fake_adts_bytes(mid, 48000, 3, 2, 64),
            lambda mid: MM.fake_mkv_bytes(mid, 900, 20, 20, 8000, 2),
        ]
    )


_PARSERS = (
    MM._wav_meta,
    MM._mp4_meta,
    MM._mp3_meta,
    MM._ogg_meta,
    MM._adts_meta,
    MM._mkv_meta,
)


@settings(max_examples=250, deadline=None)
@given(st.data())
def test_mutated_containers_are_contained(data):
    """Byte-level mutations of valid containers (flips, truncations,
    random splices) fed to EVERY parser stay inside the catch list."""
    build = data.draw(_builders())
    blob = mutate(data, bytearray(build(data.draw(st.integers(0, 1000)))))
    for parse in _PARSERS:
        try:
            out = parse(blob)
            assert isinstance(out, tuple)
        except _CAUGHT:
            pass  # degrades to a decode_ok=false row, as designed


@settings(max_examples=250, deadline=None)
@given(st.binary(max_size=512))
def test_random_blobs_are_contained(blob):
    for parse in _PARSERS:
        try:
            out = parse(blob)
            assert isinstance(out, tuple)
        except _CAUGHT:
            pass
