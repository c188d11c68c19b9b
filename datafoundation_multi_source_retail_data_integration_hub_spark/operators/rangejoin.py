"""Banded (binned) range join: all row pairs within a time distance.

A predicate like ``abs(a.ts - b.ts) <= δ`` has no equality key, so Spark
plans it as BroadcastNestedLoopJoin — an O(n²) scan that is the canonical
100 TB scale-killer. The banded construction turns it into an equi-join:

1. bucket every row into ``floor(time / δ)``,
2. probe side explodes to its bucket and the two neighbors (any pair
   within δ spans at most adjacent buckets),
3. equi-join on the bucket id, 4. exact ``abs(Δ) <= δ`` post-filter.

Each qualifying pair is produced exactly once (the build side keeps its
single true bucket; the probe's 3-bucket expansion covers it uniquely).
Cost: 3× probe-side fan-out + one hash exchange on the bucket id, with
per-bucket work proportional to local density — the same trick DuckDB's
IEJoin and dedicated interval-join engines (Flink, KDB) apply internally.

Times are compared at MICROsecond grain as exact BIGINTs (no float
epoch), matching the corpus' nanos→micros truncation on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_window_pairs(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    max_gap_seconds: float,
) -> DataFrame:
    """Unordered pairs of distinct rows with ``|ts_a - ts_b| <= gap``.

    Returns one row per pair with every input column prefixed ``a_`` /
    ``b_`` plus ``gap_us`` (exact BIGINT microseconds, ``>= 0``).
    Pair identity/order is pinned by ``a_<id_col> < b_<id_col>``.
    """
    gap_limit_us = int(round(max_gap_seconds * 1_000_000))
    if gap_limit_us < 0:
        raise ValueError(f"max_gap_seconds must be >= 0, got {max_gap_seconds}")
    # bucket width must be >= 1: a zero-gap query ("simultaneous events")
    # would otherwise compute `__us % 0` = NULL in every bucket and
    # silently return no pairs; the filter below still applies the exact
    # gap_limit_us bound
    delta_us = max(1, gap_limit_us)
    base = df.select(
        *df.columns, F.unix_micros(F.col(ts_col)).alias("__us")
    ).withColumn("__b", F.col("__us") - F.col("__us") % delta_us)
    # integer bucket start (not floor-div) keeps the arithmetic exact and
    # cheap; neighbors are ±delta_us starts
    probe = base.select(
        *[F.col(c).alias(f"a_{c}") for c in df.columns],
        F.col("__us").alias("__a_us"),
        F.explode(
            F.array(
                F.col("__b") - delta_us, F.col("__b"), F.col("__b") + delta_us
            )
        ).alias("__probe"),
    )
    build = base.select(
        *[F.col(c).alias(f"b_{c}") for c in df.columns],
        F.col("__us").alias("__b_us"),
        F.col("__b").alias("__probe"),
    )
    return (
        probe.join(build, "__probe")
        .filter(
            (F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
            & (F.abs(F.col("__a_us") - F.col("__b_us")) <= gap_limit_us)
        )
        .withColumn("gap_us", F.abs(F.col("__a_us") - F.col("__b_us")))
        .drop("__probe", "__a_us", "__b_us")
    )
