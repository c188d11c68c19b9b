"""Batch sessionization: gap-based session assignment via lag + cumsum.

The classic Spark pattern for session windows outside streaming (the
streaming twin is ``session_window`` in ``streaming.pipelines``): order
events per user, mark a new session whenever the gap to the previous event
exceeds the threshold, and number sessions with a running sum. Two window
passes over the same (user, time) partitioning — one shuffle total, and
the partition key is the user id, so a 100 TB event log parallelizes per
user with AQE handling hot users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.parity import fixed_sum


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign ``session_id`` (0-based per user, chronological)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us <= gap_seconds * 1_000_000), 0
    ).otherwise(1)
    running = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session aggregate: bounds, event count, total value.
    ``order_tiebreak`` plumbs through to :func:`sessionize` — frames
    without an ``event_id`` column must name their own tie column."""
    s = sessionize(
        df,
        user_col=user_col,
        ts_col=ts_col,
        order_tiebreak=order_tiebreak,
        gap_seconds=gap_seconds,
    )
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        # event values are 2-decimal money (corpus contract) — long fast path
        fixed_sum(value_col, 2).alias("total_value"),
    )
