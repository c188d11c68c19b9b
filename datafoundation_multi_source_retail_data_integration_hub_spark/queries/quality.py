"""Data-quality / validation queries (reference P13: "Data validation",
"Type casting & validation", ``README.md:56,62``) and exact percentile
profiling.

Validation is expressed as aggregated constraint counters — one scan, all
rules evaluated as codegen'd conditional counts; at 100 TB this is the
only affordable shape (never row-by-row assertion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables


def lineitem_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    bad = {
        "n_nonpositive_price": F.col("l_extendedprice") <= 0,
        "n_discount_out_of_range": (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1),
        "n_tax_out_of_range": (F.col("l_tax") < 0) | (F.col("l_tax") > 1),
        "n_null_keys": F.col("l_orderkey").isNull() | F.col("l_partkey").isNull(),
        "n_ship_before_epoch": F.col("l_shipdate")
        < F.lit("1990-01-01").cast("timestamp"),
    }
    return li.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in bad.items()
        ],
    )


LINEITEM_VALIDATION_ORACLE = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonpositive_price,
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discount_out_of_range,
       CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tax_out_of_range,
       CAST(sum(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_keys,
       CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ship_before_epoch
FROM lineitem
"""


def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (sort-based, order-independent — the
    same doubles fall out of any engine, no rounding needed)."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return orders.agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.percentile("o_totalprice", 0.99).alias("p99"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


ORDER_PERCENTILES_ORACLE = """
SELECT quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
"""


QUERIES = {
    "lineitem_validation_summary": lineitem_validation_summary,
    "order_price_percentiles": order_price_percentiles,
}

ORACLES = {
    "lineitem_validation_summary": LINEITEM_VALIDATION_ORACLE,
    "order_price_percentiles": ORDER_PERCENTILES_ORACLE,
}
