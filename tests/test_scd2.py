"""SCD2 semantics unit tests against hand-computed goldens (SURVEY §5.3-5.4).

Exercises, on a tiny in-memory dim, the exact reference semantics
(``etl/load_to_query.py:96-151``): initial load / new member / changed
member / unchanged member / re-run idempotence — plus the global
invariants (one current row per key, non-overlapping versions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.scd2 import (
    SCD2Config,
    add_row_hash,
    scd2_initial_load,
    scd2_merge,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.keys import (
    with_global_row_number,
)

CFG = SCD2Config(
    natural_key="cust_id", compare_cols=("name", "segment"), surrogate_key="cust_key"
)

BATCH1 = [
    ("C1", "Alice", "Consumer"),
    ("C2", "Bob", "Corporate"),
    ("C3", "Cara", "Home Office"),
    ("C3", "Cara", "Home Office"),  # duplicate row -> dedup'd member
]
# C1 unchanged, C2 changes segment, C4 is new, C3 absent (stays current)
BATCH2 = [
    ("C1", "Alice", "Consumer"),
    ("C2", "Bob", "Home Office"),
    ("C4", "Dan", "Consumer"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "cust_id string, name string, segment string")


def test_initial_load_semantics(spark):
    dim = scd2_initial_load(_df(spark, BATCH1), CFG, "2026-01-01")
    rows = {r["cust_id"]: r for r in dim.collect()}
    assert len(rows) == 3  # dedup'd
    assert [rows[k]["cust_key"] for k in ("C1", "C2", "C3")] == [1, 2, 3]
    for r in rows.values():
        assert str(r["effective_date"]) == "2026-01-01"
        assert r["expiry_date"] is None
        assert r["is_current"] == 1


def test_merge_new_changed_unchanged(spark):
    dim = scd2_initial_load(_df(spark, BATCH1), CFG, "2026-01-01")
    merged = scd2_merge(dim, _df(spark, BATCH2), CFG, "2026-02-01")
    rows = sorted(
        ((r["cust_id"], r["cust_key"], r["is_current"], str(r["expiry_date"]), r["segment"]) for r in merged.collect())
    )
    assert rows == [
        ("C1", 1, 1, "None", "Consumer"),        # unchanged: no-op
        ("C2", 2, 0, "2026-02-01", "Corporate"),  # changed: expired old
        ("C2", 4, 1, "None", "Home Office"),      # changed: new version
        ("C3", 3, 1, "None", "Home Office"),      # absent from batch: kept
        ("C4", 5, 1, "None", "Consumer"),         # new member
    ]


def test_merge_idempotent(spark):
    dim = scd2_initial_load(_df(spark, BATCH1), CFG, "2026-01-01")
    merged = scd2_merge(dim, _df(spark, BATCH2), CFG, "2026-02-01")
    again = scd2_merge(merged, _df(spark, BATCH2), CFG, "2026-03-01")
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b  # re-merging the same batch changes nothing


def test_invariant_one_current_per_key(spark):
    dim = scd2_initial_load(_df(spark, BATCH1), CFG, "2026-01-01")
    merged = scd2_merge(dim, _df(spark, BATCH2), CFG, "2026-02-01")
    per_key = (
        merged.filter(F.col("is_current") == 1).groupBy("cust_id").count().collect()
    )
    assert all(r["count"] == 1 for r in per_key)
    # surrogate keys unique across all versions
    assert merged.select("cust_key").distinct().count() == merged.count()


def test_null_change_detection(spark):
    b1 = spark.createDataFrame(
        [("C1", None, "Consumer")], "cust_id string, name string, segment string"
    )
    b2_same = spark.createDataFrame(
        [("C1", None, "Consumer")], "cust_id string, name string, segment string"
    )
    b2_diff = spark.createDataFrame(
        [("C1", "Ann", "Consumer")], "cust_id string, name string, segment string"
    )
    dim = scd2_initial_load(b1, CFG, "2026-01-01")
    same = scd2_merge(dim, b2_same, CFG, "2026-02-01")
    assert same.count() == 1  # NULL == NULL: not a change
    diff = scd2_merge(dim, b2_diff, CFG, "2026-02-01")
    assert diff.count() == 2  # NULL -> value: a change


def test_row_hash_null_vs_empty(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "")], "k string, v string"
    )
    hashed = add_row_hash(df, ["k", "v"]).select("row_hash").collect()
    assert hashed[0]["row_hash"] != hashed[1]["row_hash"]


def test_global_row_number_distributed_matches_window(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 4999).alias("k")
    ).distinct()
    fast = with_global_row_number(df, ["k"], "rn")
    dist = with_global_row_number(df, ["k"], "rn", force_distributed=True, num_partitions=7)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, dist.collect()))


def test_auto_threshold_routes_scd2_through_distributed_path(spark, monkeypatch):
    """Above SMALL_DIM_THRESHOLD the auto-gate must pick the distributed
    two-phase numbering WITHOUT any caller flag: lower the threshold so a
    small fixture trips it, run scd2_initial_load unchanged, and check both
    the plan (no single-partition window) and the numbering."""
    from datafoundation_multi_source_retail_data_integration_hub_spark.operators import (
        keys as keys_mod,
    )

    monkeypatch.setattr(keys_mod, "SMALL_DIM_THRESHOLD", 10)
    src = spark.createDataFrame(
        [(f"c{i:03d}", f"name{i}", f"seg{i % 3}") for i in range(50)],
        "cust_id string, name string, segment string",
    )
    dim = scd2_initial_load(src, CFG, "2026-01-01")
    plan = dim._jdf.queryExecution().executedPlan().toString()
    # the single-task path uses a row_number window; the distributed path
    # has a per-partition window (partitioned by __pid) plus a broadcast
    # offset join — detect it by the offset-join column
    assert "p_off" in plan
    rows = dim.select("cust_id", "cust_key").collect()
    by_key = sorted((r["cust_id"], r["cust_key"]) for r in rows)
    assert [sk for _, sk in by_key] == list(range(1, 51))
