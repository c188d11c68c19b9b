"""Warehouse writers + catalog bootstrap.

Reference surface: BigQuery dataset get-or-create (S8,
``etl/load_to_query.py:59-68``), full-replace dim/fact loads (S6,
``:163-169,196-202``), append staging loads (U2).

Spark-native: catalog databases + parquet-backed managed tables. At scale,
facts are written partitioned by a date column so downstream date filters
prune partitions at the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_DATABASE = "retail_warehouse"


def ensure_database(spark: SparkSession, name: str = DEFAULT_DATABASE) -> None:
    """get-or-create the warehouse namespace (reference S8)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def write_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    database: str = DEFAULT_DATABASE,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Managed-table write. ``mode='overwrite'`` reproduces the reference's
    full-replace semantics; ``'append'`` its staging loads."""
    ensure_database(df.sparkSession, database)
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(f"{database}.{table}")


def read_table(
    spark: SparkSession, table: str, database: str = DEFAULT_DATABASE
) -> DataFrame:
    """Warehouse scan (reference S7); callers handle missing tables the way
    the reference does (catch -> empty/initial load)."""
    return spark.table(f"{database}.{table}")


def table_exists(
    spark: SparkSession, table: str, database: str = DEFAULT_DATABASE
) -> bool:
    return spark.catalog.tableExists(f"{database}.{table}")
