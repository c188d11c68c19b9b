"""Regression pins for the r10 operator-edge review fixes.

Each test drives a path the sf-corpus oracles never reach: schema-drift
batches into a dimension merge, NULLs into exact quantiles, a zero-gap
range join, unsupported salted-join types, a custom session tie-break,
and the distributed numbering path's single-exchange contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.keys import (
    with_global_row_number,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.quantiles import (
    exact_quantile_edges,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.rangejoin import (
    time_window_pairs,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.sessionize import (
    session_stats,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.skew import (
    salted_join,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.storage import (
    unpersist_all,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.plans.star_schema import (
    DimensionSpec,
    build_dimension,
    merge_dimension,
)


def test_merge_dimension_empty_batch_passes_through(spark):
    spec = DimensionSpec("product", ("product_id", "product_name"), "product_key")
    src = spark.createDataFrame(
        [(1, "widget"), (2, "gadget")], ["product_id", "product_name"]
    )
    dim = build_dimension(src, spec, "2026-01-01")
    # a batch that lost EVERY dim column: nothing to merge, dim unchanged
    # (the pre-fix path raised IndexError from an empty column tuple)
    alien = spark.createDataFrame([(9,)], ["unrelated"])
    merged = merge_dimension(dim, alien, spec, "2026-02-01")
    assert merged is dim


def test_merge_dimension_partial_batch_is_refused(spark):
    spec = DimensionSpec("product", ("product_id", "product_name"), "product_key")
    src = spark.createDataFrame(
        [(1, "widget"), (2, "gadget")], ["product_id", "product_name"]
    )
    dim = build_dimension(src, spec, "2026-01-01")
    # a batch missing product_name would rebuild the merge config from
    # the shrunken list and silently DROP the column from history
    partial = spark.createDataFrame([(3,)], ["product_id"])
    with pytest.raises(ValueError, match="partial batch"):
        merge_dimension(dim, partial, spec, "2026-02-01")


def test_exact_quantile_edges_ignore_nulls(spark):
    df = spark.createDataFrame(
        [(None,), (1.0,), (2.0,), (3.0,), (None,), (4.0,), (5.0,)],
        "x double",
    )
    # quantile_cont semantics: NULLs are invisible — median of 1..5 is 3
    assert exact_quantile_edges(df, "x", [0.0, 0.5, 1.0]) == [1.0, 3.0, 5.0]


def test_time_window_pairs_zero_gap(spark):
    rows = [
        (1, "2026-01-01 00:00:00"),
        (2, "2026-01-01 00:00:00"),  # simultaneous with 1
        (3, "2026-01-01 00:00:01"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = time_window_pairs(df, "ts", "event_id", 0.0).collect()
    # pre-fix: `% 0` NULL'd every bucket and returned zero pairs
    assert [(r["a_event_id"], r["b_event_id"], r["gap_us"]) for r in got] == [
        (1, 2, 0)
    ]
    with pytest.raises(ValueError):
        time_window_pairs(df, "ts", "event_id", -1.0)


def test_salted_join_rejects_right_and_full(spark):
    big = spark.createDataFrame([(7, "x")], ["k", "a"])
    small = spark.createDataFrame([(7, "y")], ["k", "b"])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, "k", [7], how=how)


def test_session_stats_custom_tiebreak(spark):
    rows = [
        (1, "2026-01-01 00:00:00", 10.0, "a"),
        (1, "2026-01-01 00:10:00", 5.0, "b"),
        (1, "2026-01-01 02:00:00", 1.0, "c"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value", "tag"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # no event_id column — pre-fix this raised UNRESOLVED_COLUMN
    got = session_stats(df, order_tiebreak="tag").orderBy("session_id").collect()
    assert [(r["session_id"], r["n_events"]) for r in got] == [(0, 2), (1, 1)]


def test_distributed_numbering_single_exchange(spark):
    """The forced-distributed path must plan exactly ONE exchange (the
    range partition) — the pre-fix window-over-partition-id form added a
    second full hash exchange."""
    import contextlib
    import io

    df = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 997).alias("v")
    )
    out = with_global_row_number(df, ["v", "k"], "rn", force_distributed=True)
    try:
        rows = out.select("v", "k", "rn").collect()
        rows.sort(key=lambda r: (r["v"], r["k"]))
        assert all(r["rn"] == i + 1 for i, r in enumerate(rows))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        import re

        shuffles = re.findall(
            r"Arguments: (hashpartitioning|rangepartitioning)", plan
        )
        assert shuffles.count("hashpartitioning") == 0, plan[:2000]
        assert shuffles.count("rangepartitioning") >= 1
    finally:
        unpersist_all()
