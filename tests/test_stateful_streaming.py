"""applyInPandasWithState: state genuinely crosses micro-batches.

The events parquet is split into two files read one-per-trigger, so every
user's total accumulates across >= 2 batches; the final running value must
equal the batch-mode per-user sum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.streaming.stateful import (
    running_total_per_user,
)

from .conftest import SF_SMOKE


def test_running_total_state_across_batches(spark, tmp_path):
    from datafoundation_multi_source_retail_data_integration_hub_spark.sources.tables import (
        load_table,
    )

    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_split")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_total_per_user(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = spark.table("running_totals").collect()
    # each user was emitted once per micro-batch containing their events
    per_user_emits = {}
    finals = {}
    for r in emitted:
        per_user_emits[r["user_id"]] = per_user_emits.get(r["user_id"], 0) + 1
        finals[r["user_id"]] = max(
            finals.get(r["user_id"], float("-inf")), r["running_value"]
        )
    assert max(per_user_emits.values()) == 2  # state crossed batches

    expected = {
        r["user_id"]: r["total"]
        for r in events.groupBy("user_id").agg(F.sum("value").alias("total")).collect()
    }
    assert set(finals) == set(expected)
    for u in expected:
        assert finals[u] == pytest.approx(expected[u], rel=1e-9)
