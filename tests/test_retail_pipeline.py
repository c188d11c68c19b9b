"""End-to-end reference-flow test: latin1 CSV -> star schema -> marts.

Fixture mirrors the reference data quirks (FIXTURES.md §A): M/d/yyyy
dates, ~blank category column, a product_id mapping to two names (the
SCD2 trigger), latin1 encoding.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.pipelines import retail

HEADER = (
    "Row ID,Order ID,Order Date,Ship Date,Customer ID,Customer Name,Segment,"
    "Region,Product ID,Category,Sub-Category,Product Name,Sales,Quantity,"
    "Discount,Profit\n"
)

ROWS = [
    # customer C1 x2, product P1 with TWO names (dup member in initial load)
    "1,CA-1,1/3/2014,1/7/2014,C1,Ana Mart\xedn,Consumer,West,P1,,Binders,Binder A,10.0,2,0.0,2.5\n",
    "2,CA-1,1/3/2014,1/7/2014,C1,Ana Mart\xedn,Consumer,West,P1,,Binders,Binder B,20.0,1,0.1,3.0\n",
    "3,CA-2,2/14/2014,2/18/2014,C2,Bob Roy,Corporate,East,P2,Electronics,Phones,Phone X,300.0,1,0.2,40.0\n",
    "4,CA-3,3/1/2014,3/5/2014,C3,Cara Lee,Home Office,South,P3,,Paper,Paper Y,5.0,5,0.0,1.0\n",
]


@pytest.fixture()
def star(spark, tmp_path):
    p = tmp_path / "superstore_fixture.csv"
    p.write_bytes((HEADER + "".join(ROWS)).encode("latin1"))
    return retail.run_etl(spark, str(p), effective_date="2026-01-01")


def test_dims_built_with_column_intersection(star):
    # dim_store keeps only its columns present in the source ('region'
    # here); the reference intersects the same way and skips a dim only
    # when NO columns are found (load_to_query.py:88-91)
    assert set(star.dimensions) == {
        "dim_customer",
        "dim_product",
        "dim_store",
        "dim_date",
    }
    assert star.dimensions["dim_store"].columns[:1] == ["region"]


def test_dim_with_all_columns_missing_is_skipped(spark):
    from datafoundation_multi_source_retail_data_integration_hub_spark.plans.star_schema import (
        DimensionSpec,
        build_dimension,
    )

    df = spark.createDataFrame([("x",)], "other string")
    spec = DimensionSpec(
        name="dim_none", columns=("a", "b"), surrogate_key="k", scd2=True
    )
    assert build_dimension(df, spec, "2026-01-01") is None


def test_scd2_initial_duplicate_member(star):
    prod = star.dimensions["dim_product"]
    p1 = prod.filter(F.col("product_id") == "P1").collect()
    # two names for one natural key -> two distinct members, both current
    assert len(p1) == 2
    assert all(r["is_current"] == 1 for r in p1)
    keys = prod.select("product_key").rdd.map(lambda r: r[0]).collect()
    assert sorted(keys) == list(range(1, len(keys) + 1))


def test_fact_resolution_reference_fanout(star):
    fact = star.fact
    # P1 has two current members (two product names), so its two source
    # rows fan out to four — the reference's key map does the same
    # (load_to_query.py:173-176 keeps all current rows, no dedup)
    assert fact.count() == 6
    # date key is the int yyyyMMdd under the original column name
    dates = {r["order_date"] for r in fact.select("order_date").collect()}
    assert dates == {20140103, 20140214, 20140301}
    assert "customer_key" in fact.columns and "product_key" in fact.columns
    # every row resolved to a customer key (left join, no losses)
    assert fact.filter(F.col("customer_key").isNull()).count() == 0


def test_fact_resolution_dedup_key_map(spark, tmp_path):
    from datafoundation_multi_source_retail_data_integration_hub_spark.plans.star_schema import (
        build_dimension,
        resolve_fact,
    )

    p = tmp_path / "fixture2.csv"
    p.write_bytes((HEADER + "".join(ROWS)).encode("latin1"))
    staged = retail.extract_sales(spark, str(p))
    dims = {
        s.name: d
        for s in retail.DIMENSIONS
        if (d := build_dimension(staged, s, "2026-01-01")) is not None
    }
    fact = resolve_fact(
        staged,
        retail.FACT,
        dims,
        {s.name: s for s in retail.DIMENSIONS},
        dedup_key_map=True,
    )
    assert fact.count() == 4  # sane mode: one surrogate per natural key


def test_dim_date_continuous(star):
    dd = star.dimensions["dim_date"]
    n = dd.count()
    # 2014-01-03 .. 2014-03-01 inclusive = 58 days
    assert n == 58
    assert dd.filter(F.col("is_weekend").isin(0, 1)).count() == n


def test_marts(star):
    perf = retail.mart_sales_performance(star).collect()
    assert {r["order_date"] for r in perf} == {20140103, 20140214, 20140301}
    cat = retail.mart_category_analysis(star)
    total = cat.agg(F.sum("total_sales")).first()[0]
    # 365 = 335 + the P1 fan-out duplicating rows 1-2 (reference parity,
    # see test_fact_resolution_reference_fanout)
    assert total == pytest.approx(365.0)


def test_dashboard_null_patch(spark):
    df = spark.createDataFrame(
        [("", "Consumer"), ("Electronics", None)], "category string, segment string"
    )
    out = retail.patch_dashboard_nulls(df).collect()
    got = {(r["category"], r["segment"]) for r in out}
    assert got == {("Jewellery", "Consumer"), ("Electronics", "Consumer")}
