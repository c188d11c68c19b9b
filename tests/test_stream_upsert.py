"""foreachBatch SCD2 upsert: two incremental streaming runs must land
exactly the same dimension as the batch initial-load + merge path, and a
checkpoint re-run must be a no-op (exactly-once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.scd2 import (
    SCD2Config,
    scd2_initial_load,
    scd2_merge,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.sources import (
    writers as W,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.streaming.upsert import (
    scd2_stream_upsert,
)

CFG = SCD2Config(
    natural_key="cust_id",
    compare_cols=("name", "segment"),
    surrogate_key="cust_key",
)
D0, D1 = "2026-01-01", "2026-02-01"
SCHEMA = "cust_id LONG, name STRING, segment STRING"

BATCH1 = [(1, "alice", "retail"), (2, "bob", "corp"), (3, "carol", "retail")]
# bob changes segment, dave is new, alice re-asserted unchanged
BATCH2 = [(1, "alice", "retail"), (2, "bob", "retail"), (4, "dave", "corp")]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_upsert_matches_batch_scd2(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    db = "stream_upsert_test"

    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    b2 = spark.createDataFrame(BATCH2, SCHEMA)

    def stream():
        return spark.readStream.schema(SCHEMA).parquet(str(src))

    b1.coalesce(1).write.mode("append").parquet(str(src))
    q = scd2_stream_upsert(stream(), CFG, "dim_cust", db, D0, ckpt)
    q.awaitTermination(120)
    got_d0 = W.read_table(spark, "dim_cust", db)
    assert _rows(got_d0) == _rows(scd2_initial_load(b1, CFG, D0))
    assert got_d0.filter(F.col("is_current") == 1).count() == 3

    # second run: only the new file is processed (checkpoint offset)
    b2.coalesce(1).write.mode("append").parquet(str(src))
    q = scd2_stream_upsert(stream(), CFG, "dim_cust", db, D1, ckpt)
    q.awaitTermination(120)
    got_d1 = W.read_table(spark, "dim_cust", db)
    want = scd2_merge(scd2_initial_load(b1, CFG, D0), b2, CFG, D1)
    assert _rows(got_d1) == _rows(want)
    # bob has an expired + a current version; dave inserted; alice untouched
    assert got_d1.count() == 5
    bob = {
        (r["segment"], r["is_current"])
        for r in got_d1.filter(F.col("cust_id") == 2).collect()
    }
    assert bob == {("corp", 0), ("retail", 1)}

    # re-run with NO new input: exactly-once, table unchanged
    q = scd2_stream_upsert(stream(), CFG, "dim_cust", db, "2026-03-01", ckpt)
    q.awaitTermination(120)
    assert _rows(W.read_table(spark, "dim_cust", db)) == _rows(want)