"""Event/window/sessionization/streaming queries match their oracles."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import eventops
from datafoundation_multi_source_retail_data_integration_hub_spark.streaming import pipelines

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(eventops.QUERIES))
def test_eventops_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, eventops.QUERIES[name], eventops.ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(pipelines.QUERIES))
def test_streaming_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, pipelines.QUERIES[name], pipelines.ORACLES[name], name)


def test_streaming_session_windows_run(spark):
    """Native session_window streaming path executes and produces rows."""
    out = pipelines.run_to_memory(
        pipelines.session_windows(pipelines.events_stream(spark, SF_SMOKE))
    )
    assert out.count() > 0


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Pin the boundary semantics: Spark's session_window MERGES an event
    arriving exactly gap after the previous one (adjacent windows
    coalesce); only strictly-greater spacing starts a new session. The
    stream query must agree with its strict-> oracle on boundary data."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    gap = dt.timedelta(minutes=30)
    rows = [
        # user 1: exact 30-min spacing -> windows touch -> ONE session
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + gap, 1, "click", 1.0, "{}"),
        (3, t0 + 2 * gap, 1, "click", 1.0, "{}"),
        # user 2: one microsecond inside the gap -> one session
        (4, t0, 2, "click", 1.0, "{}"),
        (5, t0 + gap - dt.timedelta(microseconds=1), 2, "click", 1.0, "{}"),
        # user 3: one microsecond beyond the gap -> two sessions
        (6, t0, 3, "click", 1.0, "{}"),
        (7, t0 + gap + dt.timedelta(microseconds=1), 3, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "boundary")
    df.coalesce(1).write.parquet(src + "/tmp_out", mode="overwrite")
    # events_stream globs for a file literally named events.parquet
    import glob
    import shutil

    part = glob.glob(src + "/tmp_out/part-*.parquet")[0]
    shutil.move(part, src + "/events.parquet")

    out = pipelines.run_to_memory(
        pipelines.session_windows(pipelines.events_stream(spark, src))
    )
    from pyspark.sql import functions as F

    per_user = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_user == {1: 1, 2: 1, 3: 2}

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{src}/events.parquet'")
    orows = sorted(
        (r[0], r[1], r[2], r[3], float(r[4]))
        for r in con.execute(
            pipelines.ORACLES["stream_session_windows"]
        ).fetchall()
    )
    srows = sorted(
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            float(r["total_value"]),
        )
        for r in out.collect()
    )
    assert srows == orows
