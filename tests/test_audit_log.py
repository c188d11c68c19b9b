"""etl_run_log audit table: appends accumulate, one row per run
(reference ``README.md:74-79`` staging surface)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.pipelines.audit import (
    RUN_LOG_TABLE,
    RunLogEntry,
    log_run,
    logged_write,
    run_history,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.sources.writers import (
    read_table,
)

DB = "audit_test_db"


@pytest.fixture()
def clean_db(spark):
    yield
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def test_two_runs_append_two_rows(spark, clean_db):
    t1 = datetime(2026, 1, 1, 0, 0, 0)
    t2 = datetime(2026, 1, 1, 0, 5, 0)
    log_run(
        spark,
        RunLogEntry("run-1", "dim_customer", 100, "success", t1, t2),
        database=DB,
    )
    log_run(
        spark,
        RunLogEntry("run-2", "dim_customer", 120, "success", t2, t2),
        database=DB,
    )
    log = read_table(spark, RUN_LOG_TABLE, database=DB)
    assert log.count() == 2
    assert {r["run_id"] for r in log.collect()} == {"run-1", "run-2"}
    newest = run_history(spark, database=DB).first()
    assert newest["run_id"] == "run-2"


def test_logged_write_records_count_and_status(spark, clean_db):
    df = spark.range(0, 42).select(F.col("id").alias("k"))
    t = datetime(2026, 2, 1, 12, 0, 0)
    n = logged_write(df, "some_table", "run-9", t, t, database=DB)
    assert n == 42
    assert read_table(spark, "some_table", database=DB).count() == 42
    row = read_table(spark, RUN_LOG_TABLE, database=DB).first()
    assert (row["run_id"], row["table_name"], row["n_rows"], row["status"]) == (
        "run-9",
        "some_table",
        42,
        "success",
    )
