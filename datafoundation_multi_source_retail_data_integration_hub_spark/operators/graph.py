"""Connected components over a pair graph — near-duplicate clustering.

Pairwise near-dup detection (Jaccard / MinHash / SimHash / cosine) yields
edges; dedup needs CLUSTERS: every document labeled with its component's
representative (minimum id). This is the canonical iterative Spark
algorithm — min-label propagation to a fixpoint:

1. label(v) = v
2. label(v) = min(label(v), min over neighbors' labels)
3. shortcut: label(v) = label(label(v))  (pointer doubling)
4. repeat until no label changes — O(log diameter) rounds thanks to the
   shortcut step; each round is two hash joins, fully distributed.

Iterative-DataFrame discipline: every round ends in a checkpoint, which
TRUNCATES the logical plan. Without it the lineage grows with each join
and analysis/codegen memory explodes after ~15 rounds (observed: driver
OOM on a 20-hop chain). Locally an executor-storage ``localCheckpoint``
suffices; on a cluster pass ``checkpoint_dir`` (HDFS/object store) so the
truncated lineage survives executor loss — 100 TB runs must not restart a
50-round fixpoint because one node died.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 50


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; the component label
    is the minimum node id in the component.

    ``checkpoint_dir``: when set, rounds checkpoint RELIABLY to that
    directory (``sparkContext.setCheckpointDir`` + ``DataFrame.checkpoint``)
    instead of to executor-local storage.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    edges = ckpt(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = ckpt(
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("comp").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels["node"] == neighbor_min["node2"], "left"
        ).select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                "comp"
            ),
        )
        # pointer doubling: comp(v) <- comp(comp(v)); comp is min-monotone,
        # so following one extra hop only ever lowers the label
        hop = stepped.select(
            F.col("node").alias("cnode"), F.col("comp").alias("ccomp")
        )
        new_labels = (
            stepped.join(hop, stepped["comp"] == hop["cnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ccomp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        new_labels = ckpt(new_labels)  # truncate lineage every round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("comp").alias("cluster_rep"))
