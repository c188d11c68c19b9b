"""Approximate aggregates: sketch-based distinct counts and quantiles.

No cross-engine oracle (HLL/GK sketches are implementation-specific);
the contract is bounded relative error vs the exact answer — which is the
production contract at 100 TB, where these replace exact shuffles."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.sources.tables import (
    load_table,
)

from .conftest import SF_SMOKE


def test_approx_count_distinct_within_tolerance(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_within_tolerance(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    exact = orders.select(F.percentile("o_totalprice", 0.5)).first()[0]
    approx = orders.select(
        F.percentile_approx("o_totalprice", 0.5, 10000)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.01
