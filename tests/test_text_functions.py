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
