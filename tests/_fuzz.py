"""Shared mutation harness for the hostile-input containment property
tests (AV tier: test_av_properties.py; image tier:
test_codec_properties.py) — one implementation so a new mutation kind
reaches both tiers' coverage."""

from __future__ import annotations

from hypothesis import strategies as st


def mutate(data, p: bytearray) -> bytes:
    """Apply 1-6 hypothesis-drawn mutations (byte flips, truncations,
    random splices) to a valid container and return the mutant."""
    for _ in range(data.draw(st.integers(1, 6))):
        kind = data.draw(st.integers(0, 2))
        if kind == 0 and p:  # flip a byte
            i = data.draw(st.integers(0, len(p) - 1))
            p[i] = data.draw(st.integers(0, 255))
        elif kind == 1:  # truncate
            p = p[: data.draw(st.integers(0, len(p)))]
        else:  # splice random bytes at a random point
            i = data.draw(st.integers(0, len(p)))
            blob = bytes(data.draw(st.lists(st.integers(0, 255), max_size=16)))
            p = p[:i] + bytearray(blob) + p[i:]
    return bytes(p)
