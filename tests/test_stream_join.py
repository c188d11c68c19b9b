"""Stream-stream interval join: cross-batch state, interval bounds, and
oracle parity (the parametrized test in test_eventops_oracle covers the
sf0.001 corpus run; here the streaming-specific semantics are pinned on
synthetic two-batch replays through one checkpoint)."""

from __future__ import annotations

import pandas as pd

from datafoundation_multi_source_retail_data_integration_hub_spark.streaming.pipelines import (
    interval_click_join,
)


def _run_two_batch(spark, tmp_path, purchases_batches, clicks_batches):
    """Replay (purchase, click) batch pairs as TWO availableNow runs over
    file sources through ONE checkpoint, foreachBatch-appending the join
    output to parquet — the production shape (only fault-tolerant sinks
    resume a checkpoint)."""
    base = tmp_path / "sj"
    p_src, c_src = str(base / "p"), str(base / "c")
    ckpt, out_dir = str(base / "ckpt"), str(base / "out")

    p_schema = "purchase_id LONG, user_id LONG, purchase_ts TIMESTAMP"
    c_schema = "click_id LONG, click_user LONG, click_ts TIMESTAMP"

    def write(rows, schema, path):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(path)

    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out_dir)

    results_exist = False
    for p_rows, c_rows in zip(purchases_batches, clicks_batches):
        write(p_rows, p_schema, p_src)
        write(c_rows, c_schema, c_src)
        joined = interval_click_join(
            spark.readStream.schema(p_schema).parquet(p_src),
            spark.readStream.schema(c_schema).parquet(c_src),
        )
        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream join run did not finish"
        results_exist = True
    assert results_exist
    return (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values(["purchase_id", "click_id"])
        .reset_index(drop=True)
    )


def _ts(s: str):
    return pd.Timestamp(s).to_pydatetime()


def test_pair_joins_across_checkpointed_runs(spark, tmp_path):
    """A click arriving in run 1 must still be join-state when its
    purchase arrives in run 2 — the state store carries the open interval
    across restarts. A click outside the 10-minute window never joins,
    in-batch or across batches."""
    out = _run_two_batch(
        spark,
        tmp_path,
        purchases_batches=[
            # run 1: user 2's purchase + click both in batch 1 (in-batch
            # join); user 1 has only clicks so far
            [(200, 2, _ts("2024-01-01 10:03:00"))],
            # run 2: user 1's purchase lands — must join the run-1 click
            [(100, 1, _ts("2024-01-01 10:05:00"))],
        ],
        clicks_batches=[
            [
                (10, 1, _ts("2024-01-01 10:00:00")),  # joins in run 2
                (11, 1, _ts("2024-01-01 09:00:00")),  # outside 10-min window
                (20, 2, _ts("2024-01-01 10:00:00")),  # joins in run 1
            ],
            [],
        ],
    )
    got = list(out.itertuples(index=False, name=None))
    assert got == [
        (100, 1, 10, 5 * 60 * 1_000_000),
        (200, 2, 20, 3 * 60 * 1_000_000),
    ]


def test_interval_bounds_inclusive_at_zero_and_window(spark, tmp_path):
    """Boundary semantics: gap == 0 and gap == exactly the window both
    join; one microsecond past the window does not."""
    out = _run_two_batch(
        spark,
        tmp_path,
        purchases_batches=[[(1, 7, _ts("2024-01-01 12:10:00"))], []],
        clicks_batches=[
            [
                (71, 7, _ts("2024-01-01 12:10:00")),  # gap 0 -> joins
                (72, 7, _ts("2024-01-01 12:00:00")),  # gap == window -> joins
                (73, 7, _ts("2024-01-01 11:59:59.999999")),  # 1 us past
            ],
            [],
        ],
    )
    assert list(out["click_id"]) == [71, 72]
    assert list(out["gap_us"]) == [0, 10 * 60 * 1_000_000]
