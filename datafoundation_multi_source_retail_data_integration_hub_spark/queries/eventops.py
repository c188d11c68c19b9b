"""Event-stream queries in batch mode: time windows, sessionization, JSON
flattening, deterministic dedup.

These are the batch twins of the Structured Streaming pipelines in
``streaming.pipelines`` (same semantics, same results — Spark's unified
batch/streaming model). Window starts align to the 1970 epoch in UTC on
both engines (session timezone pinned to UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import stable_avg, stable_sum, sql_stable_avg, sql_stable_sum
from ..operators.sessionize import session_stats
from ..sources.tables import load_tables

SESSION_GAP_SECONDS = 1800


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, "events")["events"]


# ---------------------------------------------------------------------------
# Tumbling window aggregation
# ---------------------------------------------------------------------------


def events_tumbling_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            stable_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _sql_bucket_start(ts: str, seconds: int) -> str:
    return (
        f"make_timestamp(CAST(floor(epoch({ts}) / {seconds}) * {seconds} AS BIGINT)"
        f" * 1000000)"
    )


EVENTS_TUMBLING_ORACLE = f"""
SELECT {_sql_bucket_start('ts', 600)} AS window_start,
       {_sql_bucket_start('ts', 600)} + INTERVAL 10 MINUTE AS window_end,
       event_type,
       count(*) AS n_events,
       {sql_stable_sum("value")} AS total_value
FROM events GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Sliding window aggregation (10 min window, 5 min slide)
# ---------------------------------------------------------------------------


def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            stable_avg(F.col("value")).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


# Each event falls in exactly two 10m/5m windows: the one starting at its
# 5-minute floor and the one 5 minutes earlier.
EVENTS_SLIDING_ORACLE = f"""
WITH expanded AS (
  SELECT {_sql_bucket_start('ts', 300)} - off * INTERVAL 5 MINUTE AS window_start,
         value
  FROM events, (SELECT unnest([0, 1]) AS off)
)
SELECT window_start,
       window_start + INTERVAL 10 MINUTE AS window_end,
       count(*) AS n_events,
       {sql_stable_avg("value")} AS avg_value
FROM expanded GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sessionization (30-minute inactivity gap)
# ---------------------------------------------------------------------------


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(
        _events(spark, sf_dir), gap_seconds=SESSION_GAP_SECONDS
    )


EVENTS_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - epoch_us(
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              > {SESSION_GAP_SECONDS * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       {sql_stable_sum("value")} AS total_value
FROM sessions GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# JSON props flattening (S3/F11: nested source flatten)
# ---------------------------------------------------------------------------


def events_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


EVENTS_JSON_ORACLE = """
SELECT event_id, event_type,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k
FROM events
"""


# ---------------------------------------------------------------------------
# Deterministic dedup: first event per (user, event_type)
# ---------------------------------------------------------------------------


def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


EVENTS_FIRST_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


QUERIES = {
    "events_tumbling_10m": events_tumbling_10m,
    "events_sliding_10m_5m": events_sliding_10m_5m,
    "events_sessionization": events_sessionization,
    "events_json_flatten": events_json_flatten,
    "events_first_per_user_type": events_first_per_user_type,
}

ORACLES = {
    "events_tumbling_10m": EVENTS_TUMBLING_ORACLE,
    "events_sliding_10m_5m": EVENTS_SLIDING_ORACLE,
    "events_sessionization": EVENTS_SESSION_ORACLE,
    "events_json_flatten": EVENTS_JSON_ORACLE,
    "events_first_per_user_type": EVENTS_FIRST_ORACLE,
}
