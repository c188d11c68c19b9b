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


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    database: str = DEFAULT_DATABASE,
) -> None:
    """Bucketed (hash-clustered) managed-table write.

    The pay-once answer to repeated fact<->fact joins at 100 TB: both
    sides written with ``bucketBy(n, key)`` land rows in
    hash(key) % n files, so a later equi-join on that key reads
    bucket i against bucket i directly — Catalyst plans a SortMergeJoin
    with NO Exchange on either side (and no Sort either when
    ``sort_cols`` pre-orders each bucket). One shuffle at write time
    replaces a shuffle per downstream join; that trade wins as soon as a
    table is joined twice, and a 100 TB fact is joined thousands of
    times. ``n_buckets`` must match across the tables being co-joined.
    """
    ensure_database(df.sparkSession, database)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(f"{database}.{table}")


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files and return that file count.

    The 100 TB maintenance pass for append-heavy tables (streaming sinks,
    micro-batch ingests): thousands of tiny files destroy scan throughput
    (per-file open cost, no row-group locality) and overload the driver's
    split enumeration. Sizing comes from the file-system footprint of the
    CURRENT files — no data scan — and the rewrite is one job with a
    round-robin ``repartition(n)`` (an AQE-stable full shuffle, chosen
    over ``coalesce`` because coalesce skews file sizes when input files
    are uneven and caps parallelism of the read stage).

    Atomicity: writes to ``<path>.__compact__`` then swaps via rename —
    the windows where readers see a half-written directory are the swap
    renames themselves (metastore-managed tables or a transactional
    format remove even those at cluster scale).
    """
    import math

    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    Path = sc._jvm.org.apache.hadoop.fs.Path
    jpath = Path(path)
    fs = jpath.getFileSystem(hconf)
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total / target_bytes_per_file))

    tmp = path.rstrip("/") + ".__compact__"
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    # swap through the SAME Hadoop FileSystem that sized the input —
    # shutil only resolves local paths, and this maintenance pass must
    # work on hdfs:// and object-store URIs too
    fs.delete(jpath, True)
    fs.rename(Path(tmp), jpath)
    return n_files
