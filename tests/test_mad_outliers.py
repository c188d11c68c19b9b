"""Median/MAD robust outlier screen (queries/profiling.events_mad_outliers
uses the same building blocks; this pins the arithmetic on a frame with a
hand-computable answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
    quantile_interp,
    sorted_vals,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.queries.profiling import (
    MAD_CUT,
)


def test_median_mad_and_outlier_count(spark):
    # values 1..9 plus one gross outlier: median 5.5 -> with 1000 added,
    # sorted = [1..9, 1000], median = (5+6)/2 = 5.5
    # deviations |x-5.5| = [4.5, 3.5, 2.5, 1.5, .5, .5, 1.5, 2.5, 3.5, 994.5]
    # sorted -> median of deviations = (2.5+2.5)/2 = 2.5
    # cut = 4.4478 * 2.5 = 11.1195 -> only 1000 exceeds it
    vals = [float(x) for x in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "value DOUBLE")
    agg = df.agg(sorted_vals(F.col("value")).alias("__v"))
    s1 = agg.select("__v", quantile_interp(F.col("__v"), 0.5).alias("med"))
    s2 = s1.select(
        "__v",
        "med",
        quantile_interp(
            F.sort_array(F.transform("__v", lambda x: F.abs(x - F.col("med")))),
            0.5,
        ).alias("mad"),
    )
    row = s2.select(
        "med",
        "mad",
        F.aggregate(
            "__v",
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + F.when(F.abs(x - F.col("med")) > F.lit(MAD_CUT) * F.col("mad"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint"),
        ).alias("n_outliers"),
    ).collect()[0]
    assert row["med"] == 5.5
    assert row["mad"] == 2.5
    assert row["n_outliers"] == 1
