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


# Event-time columns whose physical parquet encoding has drifted across
# corpus generations: TIMESTAMP(NANOS) (read as long via the legacy
# nanosAsLong conf, truncated to micros) and plain micros with no UTC flag
# (read as TIMESTAMP_NTZ by Spark 4). Both are normalized to TimestampType;
# the session timezone is pinned UTC (session.py), so the NTZ->TZ cast is a
# pure re-tag with identical wall-clock values — matching the UTC-naive
# DuckDB oracle exactly.
_EVENT_TIME_COLS = {"events": ("ts",)}


def _normalize_event_time(df: DataFrame, col: str) -> DataFrame:
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        # nanos-as-long; integer division — double loses precision > 2^53
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# DataFrame-object memo: `spark.read.parquet` resolves the schema eagerly
# (driver-side file listing + footer read, ~50-80 ms per call). A corpus
# table's logical plan is immutable and the testdata paths never change
# within a session, so the resolved relation is reused — every consumer
# still gets an identical declarative plan (pushdown/pruning unaffected;
# this caches the PLAN object, not data). Each call returns a fresh
# ``toDF`` re-projection so every caller sees NEW attribute exprIds, as
# two independent reads would produce — otherwise two branches of one
# query (e.g. an SCD2 merge joining a dim and a batch both derived from
# customer) share ids and trip Spark's ambiguous-self-join check.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. Lazy — nothing is read until an action."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    got = _TABLE_CACHE.get(key)
    if got is not None:
        return got.toDF(*got.columns)
    # Runtime-settable confs applied here (not only in the session factory)
    # because the driver harness builds its own SparkSession.
    # inferTimestampNTZ=false makes plain-micros parquet timestamps (no UTC
    # flag) scan directly as session-TZ TIMESTAMP — a scan-level fix, so
    # predicate pushdown on timestamp filters is preserved (a post-scan
    # NTZ->TZ cast would block it). Session TZ is pinned UTC, so values are
    # identical to the UTC-naive DuckDB oracle.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name in _EVENT_TIME_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _EVENT_TIME_COLS.get(name, ()):
        df = _normalize_event_time(df, col)
    _TABLE_CACHE[key] = df
    return df.toDF(*df.columns)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several corpus tables (all of them when ``names`` is empty)."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register corpus tables as temp views so ``spark.sql`` can see them."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
