"""Live JDBC roundtrip (S4/S5) against embedded Derby — the Derby jars
ship inside pyspark for the Hive metastore, so no vendor jar is needed.

Covers: append write -> full read -> partitioned (range-sliced) read, and
write-then-append accumulation. Gated: skips cleanly if the Derby driver
ever disappears from the classpath.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.sources.readers import (
    read_jdbc,
    write_jdbc,
)

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def _derby_available(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the Spark classpath")
    return _url(tmp_path)


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    write_jdbc(df, derby_url, "stg_roundtrip", properties=DRIVER)
    back = read_jdbc(spark, derby_url, "stg_roundtrip", properties=DRIVER)
    assert back.count() == 100
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_jdbc(df, derby_url, "stg_part", properties=DRIVER)
    back = read_jdbc(
        spark,
        derby_url,
        "stg_part",
        properties=DRIVER,
        partition_column="k",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
    )
    # the range slicing must actually fan out into 4 read tasks
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_jdbc_append_accumulates(spark, derby_url):
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    write_jdbc(df, derby_url, "stg_append", properties=DRIVER)
    write_jdbc(df, derby_url, "stg_append", mode="append", properties=DRIVER)
    back = read_jdbc(spark, derby_url, "stg_append", properties=DRIVER)
    assert back.count() == 20
