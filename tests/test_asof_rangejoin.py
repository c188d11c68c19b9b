"""As-of join and banded range join: semantics pinned on hand-built
frames (boundaries, ties, tolerance, directions) plus equivalence of the
banded pair join against the naive O(n²) construction."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.asof import (
    asof_join,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.rangejoin import (
    time_window_pairs,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0, 10),
            (1, _ts("2024-01-01 10:00:05"), 101.0, 11),
            (1, _ts("2024-01-01 10:00:05"), 102.0, 12),  # tie on (key, ts)
            (2, _ts("2024-01-01 10:00:03"), 200.0, 20),
        ],
        "key INT, qts TIMESTAMP, price DOUBLE, qid INT",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:59"), 1),  # before any quote
            (1, _ts("2024-01-01 10:00:00"), 2),  # exact boundary
            (1, _ts("2024-01-01 10:00:05"), 3),  # lands on the tie
            (1, _ts("2024-01-01 10:00:30"), 4),
            (2, _ts("2024-01-01 10:00:02"), 5),  # forward-only match
            (3, _ts("2024-01-01 10:00:00"), 6),  # key with no quotes
        ],
        "key INT, tts TIMESTAMP, tid INT",
    )


def _prices(df):
    return {r["tid"]: r["price"] for r in df.collect()}


def test_asof_backward(quotes, trades):
    out = asof_join(
        trades, quotes, on="key", left_ts="tts", right_ts="qts", tie_break="qid"
    )
    assert _prices(out) == {
        1: None,  # no quote yet
        2: 100.0,  # equal timestamps match
        3: 102.0,  # tie broken to the greatest qid
        4: 102.0,
        5: None,  # key 2's only quote is later
        6: None,  # unmatched key survives (left outer)
    }
    assert out.count() == 6


def test_asof_forward(quotes, trades):
    out = asof_join(
        trades,
        quotes,
        on="key",
        left_ts="tts",
        right_ts="qts",
        tie_break="qid",
        direction="forward",
    )
    assert _prices(out) == {
        1: 100.0,
        2: 100.0,  # equal timestamps match in both directions
        3: 101.0,  # earliest at-or-after, tie broken to the LOWEST qid
        4: None,
        5: 200.0,  # key 2's quote is 1s later
        6: None,
    }


def test_asof_tolerance(quotes, trades):
    out = asof_join(
        trades,
        quotes,
        on="key",
        left_ts="tts",
        right_ts="qts",
        tie_break="qid",
        tolerance_seconds=10,
    )
    # trade 4 is 25s after the last quote: nulled by the tolerance
    assert _prices(out)[4] is None
    assert _prices(out)[2] == 100.0


def test_asof_rejects_ambiguous_columns(spark, quotes):
    with pytest.raises(ValueError, match="ambiguous"):
        asof_join(quotes, quotes, on="key", left_ts="qts", right_ts="qts")


def test_banded_pairs_equal_naive(spark):
    ev = (
        spark.range(200)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                # irregular but deterministic spacing, lots of boundary gaps
                (F.col("id") * 7_340_033 + (F.col("id") % 13) * 999_983)
            ).alias("ts"),
        )
    )
    gap = 12.5
    banded = time_window_pairs(ev, "ts", "event_id", gap)
    got = {
        (r["a_event_id"], r["b_event_id"], r["gap_us"]) for r in banded.collect()
    }
    us = ev.select("event_id", F.unix_micros("ts").alias("us"))
    a = us.select(F.col("event_id").alias("a"), F.col("us").alias("ua"))
    b = us.select(F.col("event_id").alias("b"), F.col("us").alias("ub"))
    naive = a.crossJoin(b).filter(
        (F.col("a") < F.col("b"))
        & (F.abs(F.col("ua") - F.col("ub")) <= int(gap * 1e6))
    )
    want = {
        (r["a"], r["b"], abs(r["ua"] - r["ub"])) for r in naive.collect()
    }
    assert got == want
    assert len(got) > 50  # non-trivial fixture


def test_banded_pairs_exact_boundary_included(spark):
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00")), (2, _ts("2024-01-01 00:00:05"))],
        "event_id INT, ts TIMESTAMP",
    )
    out = time_window_pairs(ev, "ts", "event_id", 5.0).collect()
    assert [(r["a_event_id"], r["b_event_id"], r["gap_us"]) for r in out] == [
        (1, 2, 5_000_000)
    ]
