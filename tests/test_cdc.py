"""Changelog compaction semantics (operators/cdc.compact_changelog)."""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.cdc import (
    compact_changelog,
)

SCHEMA = "k BIGINT, seq BIGINT, op STRING, v DOUBLE"


def _compact(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = compact_changelog(
        df, key_col="k", seq_cols=("seq",), op_col="op",
        delete_op="D", payload_cols=("v",),
    )
    return {r["k"]: (r["last_v"], r["last_op"], r["n_changes"], r["n_deletes"]) for r in out.collect()}


def test_latest_upsert_wins(spark):
    got = _compact(spark, [(1, 1, "I", 10.0), (1, 2, "U", 20.0), (1, 3, "U", 30.0)])
    assert got == {1: (30.0, "U", 3, 0)}


def test_trailing_tombstone_removes_key(spark):
    got = _compact(spark, [(1, 1, "I", 10.0), (1, 2, "D", None), (2, 1, "I", 5.0)])
    assert got == {2: (5.0, "I", 1, 0)}


def test_reinsert_after_delete_survives_with_lineage(spark):
    got = _compact(
        spark,
        [(1, 1, "I", 1.0), (1, 2, "D", None), (1, 3, "I", 7.0)],
    )
    # key re-created after its tombstone: latest change wins, and the
    # lineage counts still see the full history including the delete
    assert got == {1: (7.0, "I", 3, 1)}


def test_order_is_by_sequence_not_arrival(spark):
    # rows arrive out of order; seq decides
    got = _compact(spark, [(1, 3, "U", 30.0), (1, 1, "I", 10.0), (1, 2, "U", 20.0)])
    assert got == {1: (30.0, "U", 3, 0)}


def test_merge_state_converges_regardless_of_batching(spark):
    """Associativity: fold the feed in interleaved slices (parity split —
    each slice holds sequences both older and newer than the other) and
    in a 3-way split; both equal the one-shot compaction."""
    from datafoundation_multi_source_retail_data_integration_hub_spark.operators.cdc import (
        compact_batch,
        merge_state,
        present_state,
    )

    rows = [
        (k, seq, "D" if (k + seq) % 5 == 0 else "U", float(k * 100 + seq))
        for k in range(1, 8)
        for seq in range(1, 11)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    kw = dict(
        key_col="k", seq_cols=("seq",), op_col="op",
        delete_op="D", payload_cols=("v",),
    )

    def snap(state):
        return sorted(map(tuple, present_state(state, "k", "D", ("v",)).collect()))

    oneshot = snap(compact_batch(df, **kw))

    from pyspark.sql import functions as F

    for n_slices in (2, 3):
        state = None
        for i in range(n_slices):
            part = compact_batch(df.where(F.col("seq") % n_slices == i), **kw)
            state = part if state is None else merge_state(state, part, "k")
        assert snap(state) == oneshot
