"""SimHash kernel pinned against a pure-Python reference.

The operator computes per-bit majority counts with SWAR lane packing
(21-bit lanes, three signature bits per aggregated long —
operators/dedup.py). The corpus oracles check it end-to-end; this test
pins the kernel on crafted inputs where the packing could silently go
wrong: majority TIES (2*S_j == n must yield bit 0, the strict ``> 0``
rule of the +/-1 formulation), heavy token multiplicity (lane counts
well past 1), and single-token documents (signature == hash bits).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.dedup import (
    SIMHASH_BITS,
    simhash,
)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_simhash(text: str) -> int:
    toks = text.lower().split()
    n = len(toks)
    sig = 0
    for j in range(SIMHASH_BITS):
        s_j = sum((_md5_long(t) >> j) & 1 for t in toks)
        if 2 * s_j > n:  # strict majority == sum(+/-1) > 0
            sig |= 1 << j
    return sig


def test_simhash_matches_python_reference(spark):
    docs = [
        (0, "alpha"),  # single token: signature == hash's low 60 bits
        (1, "alpha beta"),  # n=2: every differing bit is a TIE -> 0
        (2, "alpha alpha alpha beta"),  # multiplicity majority
        (3, " ".join(["gamma"] * 500 + ["delta"] * 499)),  # deep lanes
        (4, "x y z w v u t s r q p o n m l k j i h g f e d c b a"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}
    want = {i: _ref_simhash(t) for i, t in docs}
    assert got == want


def test_simhash_tie_is_zero_bit(spark):
    # two tokens: S_j is 0, 1, or 2; the j where hashes differ have
    # 2*S_j == n == 2 -> those bits MUST be 0 (strict majority)
    a, b = "alpha", "beta"
    df = spark.createDataFrame([(0, f"{a} {b}")], "doc_id long, text string")
    sig = simhash(df, "text", "doc_id").first()["simhash"]
    ha, hb = _md5_long(a), _md5_long(b)
    assert sig == ha & hb  # bit set only where BOTH hashes agree on 1


def test_simhash_invariant_under_token_order_and_case(spark):
    df = spark.createDataFrame(
        [(0, "Alpha beta GAMMA"), (1, "gamma ALPHA beta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}
    assert rows[0] == rows[1]
