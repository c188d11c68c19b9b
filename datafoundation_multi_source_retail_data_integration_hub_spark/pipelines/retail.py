"""The reference's end-to-end retail ETL, Spark-first.

Mirrors ``main.py`` -> ``load_sales`` -> ``load_to_bigquery``
(fixing the reference's ImportError so the *intended* flow runs):

1. extract: latin1 CSV -> normalize column names -> parse M/d/yyyy dates
   (``etl/load_sales.py``),
2. stage: append to a staging table (``staging_sales``),
3. warehouse: config-driven star build — SCD2 dims + calendar dim + fact
   with FK resolution, full-replace semantics (``etl/load_to_query.py``),
4. marts: the documented pre-aggregations (``README.md:82-85``).

The DIMENSIONS/FACT config mirrors ``etl/load_to_query.py:16-42``
including the dead ``dim_store`` entry (columns absent from the source ->
skipped at build, as the reference's runtime guard does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import fixed_sum, stable_sum
from ..plans.star_schema import DimensionSpec, FactSpec, StarSchema, build_star_schema
from ..sources.readers import read_csv

# reference etl/load_to_query.py:16-42, normalized column names
DIMENSIONS = [
    DimensionSpec(
        name="dim_customer",
        columns=("customer_id", "customer_name", "segment", "region"),
        surrogate_key="customer_key",
        scd2=True,
    ),
    DimensionSpec(
        name="dim_product",
        columns=("product_id", "product_name", "category", "sub_category"),
        surrogate_key="product_key",
        scd2=True,
    ),
    # dead config in the reference: these columns exist in neither CSV; the
    # build skips it exactly like load_to_query.py:88-91 does
    DimensionSpec(
        name="dim_store",
        columns=("store_id", "store_name", "city", "region"),
        surrogate_key="store_key",
        scd2=True,
    ),
]

FACT = FactSpec(
    name="fact_sales",
    measure_columns=("sales", "quantity", "discount", "profit"),
    dim_keys={"dim_customer": "customer_id", "dim_product": "product_id"},
    date_column="order_date",
)

DATE_FORMAT = "M/d/yyyy"  # Superstore CSV format (etl/load_sales.py:21-22)


def extract_sales(spark: SparkSession, path: str, encoding: str = "latin1") -> DataFrame:
    """CSV -> normalized names -> typed dates (reference extract step)."""
    df = read_csv(spark, path, encoding=encoding, infer_schema=True, normalize=True)
    for c in ("order_date", "ship_date"):
        if c in df.columns:
            df = df.withColumn(c, F.to_date(c, DATE_FORMAT))
    return df


def clean_products(df: DataFrame) -> DataFrame:
    """The standalone product stager's transforms: dedup + numeric
    null-fill (``etl/load_products.py:10-11``; Spark's ``na.fill(0)``
    scopes to numeric columns, matching the pandas intent)."""
    return df.dropDuplicates().na.fill(0)


def patch_dashboard_nulls(df: DataFrame) -> DataFrame:
    """The dashboard's null patches (``dashboard/app.py:64-65``):
    90%-blank category -> 'Jewellery', missing segment -> 'Consumer'."""
    fills = {}
    if "category" in df.columns:
        fills["category"] = "Jewellery"
    if "segment" in df.columns:
        fills["segment"] = "Consumer"
    out = df
    if "category" in df.columns:
        # blank-string categories count as missing too (the real data has
        # '' not NULL in 90% of rows)
        out = out.withColumn(
            "category",
            F.when(F.col("category") == "", None).otherwise(F.col("category")),
        )
    return out.na.fill(fills)


def run_etl(
    spark: SparkSession,
    sales_csv: str,
    effective_date: str,
    encoding: str = "latin1",
) -> StarSchema:
    """The reference's intended ``run_etl`` flow, one lazy Spark plan per
    output table."""
    staged = extract_sales(spark, sales_csv, encoding=encoding)
    return build_star_schema(
        staged,
        DIMENSIONS,
        FACT,
        effective_date=effective_date,
        date_source_col="order_date",
    )


# --- marts (README.md:82-85, 248-249) --------------------------------------


def _measure_sum(c: F.Column, dp: int | None) -> F.Column:
    """Mart measure aggregation: the fixed-point long fast path when the
    caller asserts the measures' true decimal scale (both known fact
    sources — the Superstore-style CSV and the corpus star — carry
    price*(1-discount)-shaped measures, exact at 4 decimals), else the
    decimal path (``dp=None``) for measures of unknown scale."""
    return fixed_sum(c, dp) if dp is not None else stable_sum(c)


def mart_sales_performance(star: StarSchema, measure_dp: int | None = 4) -> DataFrame:
    """Daily sales/profit mart over the resolved fact."""
    return (
        star.fact.groupBy("order_date")
        .agg(
            _measure_sum(F.col("sales"), measure_dp).alias("total_sales"),
            _measure_sum(F.col("profit"), measure_dp).alias("total_profit"),
            F.count("*").alias("n_rows"),
        )
    )


def mart_category_analysis(star: StarSchema, measure_dp: int | None = 4) -> DataFrame:
    """Category mart: join fact back to current product dim rows."""
    # product dim scales with the catalog — no hard broadcast() hint
    # (policy: queries/relational.py module doc); AQE decides.
    prod = star.dimensions["dim_product"].filter(F.col("is_current") == 1)
    return (
        star.fact.join(prod.select("product_key", "category"), "product_key")
        .groupBy("category")
        .agg(
            _measure_sum(F.col("sales"), measure_dp).alias("total_sales"),
            _measure_sum(F.col("profit"), measure_dp).alias("total_profit"),
            F.count("*").alias("n_rows"),
        )
    )
