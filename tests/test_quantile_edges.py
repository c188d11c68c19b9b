"""Pin both plans of ``operators.quantiles.exact_quantile_edges``.

The bench-scale plan (single-partition window) and the 100 TB plan
(two-phase distributed numbering from ``operators.keys``) must return
BIT-IDENTICAL edges — the drift screen's bucket comparisons and the
DuckDB ``quantile_cont`` oracle hash both depend on it. The distributed
path never runs at test SFs on its own (the row-count gate), so this
test forces it and also cross-checks the interpolation against the
``sorted_vals``/``quantile_interp`` parity form it replaced.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
    quantile_interp,
    sorted_vals,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators import (
    quantiles as Q,
)

PROBS = [0.1, 0.25, 0.5, 0.9, 0.99, 0.0, 1.0]


def _both_paths(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    small = Q.exact_quantile_edges(df, "v", PROBS)
    orig = Q.SMALL_DIM_THRESHOLD
    try:
        Q.SMALL_DIM_THRESHOLD = 0  # force the distributed numbering path
        big = Q.exact_quantile_edges(df, "v", PROBS)
    finally:
        Q.SMALL_DIM_THRESHOLD = orig
    return df, small, big


def test_paths_bit_identical_with_duplicates(spark):
    rng = random.Random(8)
    # heavy duplication on purpose: value-at-rank must not depend on
    # tie order in either plan
    values = [round(rng.uniform(0, 100), 1) for _ in range(5000)]
    df, small, big = _both_paths(spark, values)
    assert small == big  # == on floats is the bit compare we want here

    arr = df.agg(sorted_vals(F.col("v")).alias("__v"))
    legacy = [
        x
        for x in arr.select(
            *[quantile_interp(F.col("__v"), p).alias(f"e{i}") for i, p in enumerate(PROBS)]
        ).collect()[0]
    ]
    assert small == legacy


def test_empty_input_returns_no_edges(spark):
    df = spark.createDataFrame([], "v double")
    assert Q.exact_quantile_edges(df, "v", PROBS) == []


def test_single_row(spark):
    df = spark.createDataFrame([(42.5,)], "v double")
    assert Q.exact_quantile_edges(df, "v", PROBS) == [42.5] * len(PROBS)
