"""Edge-semantics pins for incremental_dedup and semantic_dedup.

The oracle tests prove sf-corpus parity; these pin the classification
rules on hand-built frames where every branch is exercised.
"""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.clustering import (
    semantic_dedup,
    unpersist_all,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.operators.dedup import (
    incremental_dedup,
)


def test_incremental_dedup_status_rules(spark):
    seen = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha  BETA"),  # normalizes to a seen text -> dup_of_seen
            (11, "fresh one"),  # new fingerprint, first in batch -> kept
            (12, "fresh one"),  # same fingerprint, higher id -> dup_in_batch
            (13, "gamma delta"),  # seen AND duplicated in batch:
            (14, "gamma delta"),  # dup_of_seen wins for BOTH rows
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(batch, seen, "text", "doc_id").collect()
    }
    assert rows == {
        10: "dup_of_seen",
        11: "kept",
        12: "dup_in_batch",
        13: "dup_of_seen",
        14: "dup_of_seen",
    }


def test_semantic_dedup_keeps_lowest_id_per_neighborhood(spark):
    # one cluster: 1 ~ 2 ~ 3 chain (all pairwise cosine 1.0); far-away 4
    # seeds the second centroid and survives alone.
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [2.0, 0.0]),  # dropped: neighbor 1 has smaller id
            (3, [3.0, 0.0]),  # dropped: neighbors 1 and 2
            (4, [0.0, 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    cents = [(0, [2.0, 0.0]), (1, [0.0, 1.0])]
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_kept"])
        for r in semantic_dedup(emb, cents, tau=0.9).collect()
    }
    unpersist_all()
    assert got == {
        1: (0, True),
        2: (0, False),
        3: (0, False),
        4: (1, True),
    }


def test_incremental_dedup_custom_id_col(spark):
    # regression: the keep-first window ordered by the PRE-alias id name,
    # so any id_col other than "doc_id" raised UNRESOLVED_COLUMN
    seen = spark.createDataFrame([(1, "alpha beta")], ["my_id", "text"])
    batch = spark.createDataFrame(
        [(10, "fresh one"), (11, "fresh one")], ["my_id", "text"]
    )
    rows = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(batch, seen, "text", "my_id").collect()
    }
    assert rows == {10: "kept", 11: "dup_in_batch"}
