"""Connected-components operator: known-topology goldens."""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.graph import (
    connected_components,
)


def test_chain_and_disjoint_components(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # triangle 10-11-12, isolated edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id1 long, id2 long",
    )
    got = {
        (r["node"], r["cluster_rep"]) for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_long_chain_converges(spark):
    n = 20  # diameter 19: exercises the iteration loop well past round 1
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id1 long, id2 long"
    )
    # driver_max_edges=0 forces the distributed fixpoint — the iteration
    # machinery is the subject here, not the union-find fast path
    out = connected_components(pairs, driver_max_edges=0).collect()
    assert all(r["cluster_rep"] == 0 for r in out)
    assert len(out) == n + 1


def test_reliable_checkpoint_dir(spark, tmp_path):
    """Same fixpoint through the reliable-checkpoint path; checkpoint files
    actually land in the given directory."""
    import os

    ckpt = str(tmp_path / "ckpt")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id1 long, id2 long"
    )
    got = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            pairs, checkpoint_dir=ckpt, driver_max_edges=0
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}
    walked = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert walked, "no checkpoint files written to the reliable dir"


def test_driver_and_distributed_paths_agree(spark):
    """The union-find fast path and the min-label fixpoint produce the
    identical (node, cluster_rep) labeling on a random multi-component
    graph — including when the probe limit sits exactly at the edge
    count (limit returns everything -> driver path) and one below it
    (overflow -> distributed path)."""
    import random

    rng = random.Random(8)
    edges = list(
        {
            (rng.randrange(60), rng.randrange(60))
            for _ in range(70)
        }
    )
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    via_driver = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            pairs, driver_max_edges=len(edges)
        ).collect()
    }
    via_fixpoint = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert via_driver == via_fixpoint
    # one under the edge count: probe overflows, distributed path runs
    via_overflow = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(
            pairs, driver_max_edges=len(edges) - 1
        ).collect()
    }
    assert via_overflow == via_fixpoint


def test_null_endpoints_agree_on_both_paths(spark):
    """Edges with a NULL endpoint are dropped up front, so the driver
    union-find and the distributed fixpoint see the identical graph —
    previously the fast path raised TypeError on None while the
    fixpoint silently dropped the edge at the joins."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, None), (None, 5), (3, 4), (None, None)],
        "id1 long, id2 long",
    )
    expect = {(1, 1), (2, 1), (3, 3), (4, 3)}
    via_driver = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(pairs, driver_max_edges=100).collect()
    }
    via_fixpoint = {
        (r["node"], r["cluster_rep"])
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert via_driver == expect
    assert via_fixpoint == expect
