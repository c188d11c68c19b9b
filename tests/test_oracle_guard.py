"""Regression test for the comparator's HUGEINT blind spot (r07).

The grading driver canonicalizes both result sets through pandas before
hashing: a DuckDB ``sum(BIGINT)`` column is HUGEINT, which pandas turns
into float64, so its raw-value hash diverges from Spark's int64 even
when every value is numerically equal. ``tests/oracle.py`` used to fetch
oracle rows with ``fetchall()`` (HUGEINT -> Python int, silently == the
Spark long), which let two uncast oracles ship green locally and fail at
the driver (purchase_graph_pagerank, doc_language_balanced_sample).

These tests pin the fix: an uncast ``sum()`` projection must FAIL the
local comparator, and the same projection with ``CAST(... AS BIGINT)``
must pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle import compare


def _spark_sum(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(F.sum("n_nationkey").cast("long").alias("key_sum"))
    )


UNCAST = """
SELECT n_regionkey, sum(n_nationkey) AS key_sum
FROM nation GROUP BY n_regionkey
"""

CAST = """
SELECT n_regionkey, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
FROM nation GROUP BY n_regionkey
"""

SF = "/root/testdata/sf0.001"


def test_uncast_hugeint_sum_fails_locally(spark):
    """DuckDB sum(BIGINT) without a cast is HUGEINT -> pandas float64:
    the comparator must reject it even though fetchall() values match."""
    with pytest.raises(AssertionError):
        compare(spark, SF, _spark_sum, UNCAST, name="hugeint_guard")


def test_cast_bigint_sum_passes(spark):
    compare(spark, SF, _spark_sum, CAST, name="hugeint_guard_cast")
