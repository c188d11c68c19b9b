"""Parquet test-corpus loaders.

The driver provisions a TPC-H-ish star corpus (see TESTDATA.md): one
parquet file per table under ``/root/testdata/sf{0.001,0.01,0.1}/``.
Parquet is the engine's native columnar format — scans get predicate
pushdown, column pruning, and vectorized decoding from Catalyst for free,
which is exactly the posture we want at 100 TB (the same loaders work on a
partitioned cloud-storage layout by pointing ``sf_dir`` at the dataset
root).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as TIMESTAMP(NANOS) in parquet — Spark's reader has no
# nanosecond timestamp type, so these are read as long (via the legacy
# nanosAsLong conf) and truncated to microseconds, matching what
# nanos-unaware engines (DuckDB included) do with the same file.
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. Lazy — nothing is read until an action."""
    if name in _NANOS_TS_COLS:
        # runtime-settable; done here (not only in the session factory)
        # because the driver harness builds its own SparkSession
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            # integer division: double division loses precision > 2^53
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several corpus tables (all of them when ``names`` is empty)."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register corpus tables as temp views so ``spark.sql`` can see them."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
