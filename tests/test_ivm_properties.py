"""Property tests for operators/ivm.py and the fixed-point PageRank.

IVM convergence: applying a dataset as ANY partition of batches, in ANY
order, must land the identical presented mart as a one-shot build — the
property the exact DECIMAL(38,0) unit-total state exists to guarantee
(and the reason the state is not rounded doubles).

PageRank: the integer fixed-point iteration must conserve (almost all)
rank mass — truncating integer division loses < 1 unit per edge and per
node — and be invariant to input row order.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators import ivm
from datafoundation_multi_source_retail_data_integration_hub_spark.sources.writers import (
    read_table,
)

CFG = ivm.IVMConfig(group_cols=("g",), unit_cols=("x_u",), dp=4)


def _rows(seed: int, n: int):
    rng = random.Random(seed)
    # 4-decimal money-ish values incl. rounding-midpoint shapes
    return [
        (rng.randrange(5), int(rng.uniform(-1e8, 1e8)))
        for _ in range(n)
    ]


def _present_map(spark, db, version):
    out = ivm.present(
        read_table(spark, ivm.state_table("m", version), database=db), CFG
    ).collect()
    return {r["g"]: (r["total_x"], r["n_rows"]) for r in out}


@pytest.mark.parametrize("seed", [1, 2])
def test_ivm_any_batching_order_matches_one_shot(spark, seed):
    from datetime import datetime

    rng = random.Random(seed)
    rows = _rows(seed, 400)
    df = spark.createDataFrame(rows, "g int, x_u long")

    t0 = datetime(2026, 1, 1)
    db_one = f"ivm_prop_one_{seed}"
    db_many = f"ivm_prop_many_{seed}"
    try:
        assert ivm.apply_batch(spark, df, "all", "m", db_one, CFG, t0, 0)
        one_shot = _present_map(spark, db_one, 0)

        # split into 4 batches, apply in shuffled order, replay one batch
        idx = list(range(len(rows)))
        rng.shuffle(idx)
        chunks = [idx[i::4] for i in range(4)]
        order = list(range(4))
        rng.shuffle(order)
        for v, b in enumerate(order):
            batch = spark.createDataFrame(
                [rows[i] for i in chunks[b]], "g int, x_u long"
            )
            assert ivm.apply_batch(
                spark, batch, f"b{b}", "m", db_many, CFG, t0, v
            )
        # at-least-once redelivery: guarded no-op
        replay = spark.createDataFrame(
            [rows[i] for i in chunks[order[-1]]], "g int, x_u long"
        )
        assert not ivm.apply_batch(
            spark, replay, f"b{order[-1]}", "m", db_many, CFG, t0, 3
        )
        assert _present_map(spark, db_many, 3) == one_shot

        # crash-window redelivery: state write landed but the audit
        # marker did not (simulated by a fresh batch_id for the same
        # version) — the rewrite re-derives v3 from the immutable v2,
        # bit-identical, never a double-merge
        assert ivm.apply_batch(
            spark, replay, f"b{order[-1]}-redelivered", "m", db_many, CFG, t0, 3
        )
        assert _present_map(spark, db_many, 3) == one_shot
    finally:
        for db in (db_one, db_many):
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_pagerank_conserves_mass_and_ignores_row_order(spark, tmp_path):
    """On a corpus-dir of shuffled copies of the same tables, the ranks
    are identical (order-independence), and total rank mass stays within
    the documented truncation loss: initialization loses < n units
    (E12 div n), each damped in-sum loses < 1 unit per in-edge plus
    < 1 unit per node from the div-20 steps."""
    from datafoundation_multi_source_retail_data_integration_hub_spark.queries.relational_ext import (
        PR_E12,
        purchase_graph_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    a = purchase_graph_pagerank(spark, sf).collect()

    # shuffled-row copy of the two inputs -> identical output
    shuf = str(tmp_path / "shuffled")
    for t in ("lineitem", "orders"):
        (
            spark.read.parquet(f"{sf}/{t}.parquet")
            .orderBy(F.rand(7))
            .coalesce(2)
            .write.parquet(f"{shuf}/{t}.parquet")
        )
    b = purchase_graph_pagerank(spark, shuf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # mass conservation on the FULL rank vector: truncating integer
    # division only destroys mass, bounded by < 1 unit per in-edge per
    # iteration (contribution div), < 1 per node per iteration (div 20
    # damping + base term), and < n at initialization
    from datafoundation_multi_source_retail_data_integration_hub_spark.queries.relational_ext import (
        PR_ITERS,
        _pagerank_ranks,
    )

    ranks = _pagerank_ranks(spark, sf)
    total = ranks.agg(F.sum("ru")).first()[0]
    n = ranks.count()
    n_edges = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf}/orders.parquet").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .count()
        * 2
    )
    loss_bound = n + PR_ITERS * (n_edges + 2 * n)
    assert total <= PR_E12
    assert PR_E12 - total <= loss_bound, (total, loss_bound)
