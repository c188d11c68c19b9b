"""FIXTURES §A2: the dummy_retail_sales source — product-stager transforms
(dedup + numeric fillna, reference etl/load_products.py) and the exact
revenue invariant revenue = quantity x unit_price x (1 - discount)
(verified on all rows of the real reference CSV)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.functions.normalize import (
    format_money,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.pipelines.retail import (
    clean_products,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.sources.readers import (
    read_csv,
)

CSV = """order_id,product_id,quantity,unit_price,discount,revenue,order_date,region
1,101,2,15.0,0.0,30.0,2024-01-01,North
2,102,1,200.0,0.10,180.0,2024-01-02,South
2,102,1,200.0,0.10,180.0,2024-01-02,South
3,103,3,45.0,0.20,108.0,2024-01-03,East
4,104,5,25.0,,125.0,2024-01-04,West
"""


def _df(spark, tmp_path):
    p = tmp_path / "dummy_retail.csv"
    p.write_text(CSV)
    return read_csv(spark, str(p), infer_schema=True)


def test_clean_products_dedup_and_fillna(spark, tmp_path):
    out = clean_products(_df(spark, tmp_path))
    assert out.count() == 4  # exact duplicate row dropped
    r4 = out.filter(F.col("order_id") == 4).first()
    assert r4["discount"] == 0.0  # numeric null -> 0 (na.fill(0))


def test_revenue_invariant_holds(spark, tmp_path):
    df = clean_products(_df(spark, tmp_path))
    violations = df.filter(
        F.abs(
            F.col("revenue")
            - F.col("quantity") * F.col("unit_price") * (1 - F.col("discount"))
        )
        > 1e-9
    ).count()
    assert violations == 0


def test_format_money(spark):
    df = spark.createDataFrame([(1234567.891,)], "v double")
    assert df.select(format_money(F.col("v")).alias("s")).first()["s"] == "1,234,567.89"
