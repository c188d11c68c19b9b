"""functions/local.local_frame: driver-local rows without the
defaultParallelism fan-out (r15 — every one-row audit append / report
frame was a 32-partition RDD scheduling 32 tasks per action)."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from datafoundation_multi_source_retail_data_integration_hub_spark.functions.local import (
    local_frame,
)

SCHEMA = (
    "run_id string, table_name string, n_rows long, status string, "
    "started_at timestamp, finished_at timestamp, message string"
)
ROW = ("r1", "t1", 5, "success", datetime(2026, 1, 1), datetime(2026, 1, 2), "")


def test_single_slice_by_default(spark):
    df = local_frame(spark, [ROW], SCHEMA)
    assert df.rdd.getNumPartitions() == 1


def test_values_and_schema_match_plain_createDataFrame(spark):
    plain = spark.createDataFrame([ROW], SCHEMA)
    ours = local_frame(spark, [ROW], SCHEMA)
    assert ours.schema == plain.schema
    assert ours.collect() == plain.collect()


def test_empty_rows_keep_schema(spark):
    df = local_frame(spark, [], "hv long")
    assert df.count() == 0
    assert df.schema == T.StructType([T.StructField("hv", T.LongType(), True)])


@pytest.mark.parametrize(
    ("n_rows", "rows_per_slice", "n_slices"),
    [(1, None, 1), (10_000, None, 1), (10_001, 5_000, 3), (4_999, 5_000, 1)],
)
def test_rows_per_slice_fanout(spark, n_rows, rows_per_slice, n_slices):
    rows = [(i,) for i in range(n_rows)]
    df = local_frame(spark, rows, "x long", rows_per_slice=rows_per_slice)
    assert df.rdd.getNumPartitions() == n_slices
    assert df.count() == n_rows
