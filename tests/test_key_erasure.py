"""Right-to-be-forgotten partition rewrite (warehouse_key_erasure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.queries.warehouse import (
    ERASE_BUCKETS,
    ERASE_MOD,
    warehouse_key_erasure,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.sources.tables import (
    load_tables,
)

SF = "/root/testdata/sf0.01"


def test_erasure_completes_and_untouched_partitions_hold(spark):
    out = warehouse_key_erasure(spark, SF).collect()
    assert len(out) == ERASE_BUCKETS
    assert all(r["erasure_complete"] for r in out)
    assert all(r["untouched_files_intact"] for r in out)
    assert sum(r["rows_erased"] for r in out) > 0  # the request list was non-empty


def test_untouched_claim_is_not_vacuous_at_oracle_sf(spark):
    # the intact boolean is vacuously true when every bucket is touched;
    # prove that at the oracle SF some buckets genuinely hold their files
    orders = load_tables(spark, SF, "orders")["orders"]
    touched = {
        r["b"]
        for r in orders.where(F.col("o_custkey") % ERASE_MOD == 0)
        .select((F.col("o_custkey") % ERASE_BUCKETS).alias("b"))
        .distinct()
        .collect()
    }
    assert len(touched) < ERASE_BUCKETS


def test_full_bucket_erasure_drops_partition(spark, monkeypatch):
    # regression: dynamic partition overwrite writes NOTHING for a
    # bucket whose rows were all erased — without the explicit
    # DROP PARTITION the stale files (and the PII) survived. ERASE_MOD=1
    # erases every key, so EVERY bucket hits the empty-remainder path.
    from datafoundation_multi_source_retail_data_integration_hub_spark.queries import (
        warehouse as WH,
    )

    monkeypatch.setattr(WH, "ERASE_MOD", 1)
    out = WH.warehouse_key_erasure(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    assert all(r["rows_after"] == 0 for r in out)
    assert all(r["rows_erased"] > 0 for r in out)
    assert all(r["erasure_complete"] for r in out)
