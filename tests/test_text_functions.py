"""Pins for the tokenizer/shingle NULL contract documented in
``functions/text.py::grams_from_tokens``: the zip_with/concat shingle
form propagates NULL elements into NULL grams, which is safe ONLY
because no tokenizer in the package can emit a NULL element. These
tests keep that precondition (and the documented behavior if it were
ever violated) from drifting silently."""

import pyspark.sql.functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.functions.text import (
    BPE_REGEX,
    grams_from_tokens,
    ws_tokens,
)


def test_tokenizers_never_emit_null_elements(spark):
    # every tokenizer output path: plain text, leading/trailing/multi
    # whitespace, empty string, punctuation-only — and a NULL input,
    # which must yield a NULL ARRAY (not an array holding NULL)
    df = spark.createDataFrame(
        [("a b  c",), (" x ",), ("",), ("?!.",), (None,)], "t string"
    )
    rows = df.select(
        ws_tokens(F.col("t")).alias("ws"),
        F.regexp_extract_all(F.col("t"), F.lit(BPE_REGEX), 0).alias("bpe"),
    ).collect()
    for r in rows:
        for arr in (r.ws, r.bpe):
            if arr is not None:
                assert all(e is not None for e in arr), arr
    assert rows[-1].ws is None and rows[-1].bpe is None


def test_grams_null_element_propagates_mid_array(spark):
    # the DOCUMENTED (never-exercised) hazard: a NULL element inside
    # the token array turns every covering bigram NULL and the NULLs
    # stay mid-array — pinned so the docstring's claim stays true to
    # the implementation
    df = spark.createDataFrame([(["a", None, "b", "c"],)], "toks array<string>")
    (row,) = df.select(grams_from_tokens(F.col("toks"), 2).alias("g")).collect()
    assert row.g == [None, None, "b c"]


def test_grams_null_array_yields_null(spark):
    df = spark.createDataFrame([(None,)], "toks array<string>")
    (row,) = df.select(grams_from_tokens(F.col("toks"), 2).alias("g")).collect()
    assert row.g is None


def test_grams_match_pure_python_reference_over_random_arrays(spark):
    """One batched Spark pass over ~200 seeded random token arrays
    (lengths 0..9, n = 1..5, including arrays shorter than the window)
    against the obvious pure-Python sliding-window reference."""
    import random

    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "d", "ee"]
    cases = [
        [rng.choice(vocab) for _ in range(rng.randrange(10))] for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(cases)], "i long, toks array<string>"
    )
    for n in range(1, 6):
        got = {
            r["i"]: r["g"]
            for r in df.select(
                "i", grams_from_tokens(F.col("toks"), n).alias("g")
            ).collect()
        }
        for i, toks in enumerate(cases):
            expect = [
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ]
            assert got[i] == expect, (n, toks)
