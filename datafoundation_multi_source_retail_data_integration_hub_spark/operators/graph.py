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

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.local import local_frame

MAX_ITERATIONS = 50

# Edge-count gate for the driver union-find fast path. A near-dup edge
# set is usually FAR smaller than the corpus (only duplicated documents
# carry edges), and below this bound the distributed fixpoint is pure
# scheduling constant: each round is ~5 driver-scheduled jobs (two hash
# joins, a groupBy, a checkpoint, a convergence count), so a 4-round run
# on a 50-edge graph costs ~20 job launches to label 60 nodes.
# Memory math (the honest, Python-object-aware version): edges arrive
# as an Arrow batch (16 B/edge) but the union-find needs a parent dict
# of Python ints — ~2 nodes/edge x (dict slot + 2 boxed int objects)
# ~= 150-200 B/edge, plus the transient .tolist() edge lists at
# ~60 B/edge. Call it ~300 B/edge end-to-end: 250k edges ~= 75 MB of
# driver heap, a safe ceiling on a default driver. (The previous 1M
# bound claimed "~16 MB" by counting raw longs only — 10-20x under
# the real footprint; same overestimate-the-cost discipline as
# ``keys.SMALL_DIM_THRESHOLD``, now applied correctly.)
DRIVER_UNION_FIND_MAX_EDGES = 250_000


def _driver_union_find(rows) -> tuple:
    """Path-compressed union-find over an iterable of (a, b) edge
    tuples (NULL-free — the caller filters endpoints); returns
    (nodes, labels) lists where labels[i] is the MIN node id of
    nodes[i]'s component — the same labeling the distributed fixpoint
    converges to."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the representative invariant holds
            # incrementally (min-id root absorbs the other)
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(parent)
    return nodes, [find(n) for n in nodes]


def connected_components(
    pairs: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    checkpoint_dir: str | None = None,
    driver_max_edges: int = DRIVER_UNION_FIND_MAX_EDGES,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; the component label
    is the minimum node id in the component.

    NULL edge endpoints are dropped up front (one filter feeding both
    paths): the distributed fixpoint would silently lose them at the
    joins while a raw union-find would raise comparing ``None`` to an
    id — filtering once makes the two paths agree on dirty input.

    Two execution paths, chosen by edge count (same exact result):

    - ``<= driver_max_edges``: Arrow-fetch the edge list and run a
      path-compressed union-find on the driver. The probe is ONE
      action — ``limit(max+1).toPandas()`` — so the fast path pays no
      extra job over the data (no separate count), and Arrow delivers
      primitive columns instead of per-row Row objects. The edge frame
      is persisted (MEMORY_AND_DISK) before the probe: when the limit
      returns everything, those partitions are already cached and the
      frame is dropped; when it overflows, the distributed fixpoint
      reuses whatever the probe materialized instead of recomputing the
      expensive upstream (e.g. a Jaccard candidate-pair join) from
      scratch.
    - larger: the distributed min-label-propagation fixpoint below —
      correct at any scale, O(log diameter) rounds.

    Pass ``driver_max_edges=0`` to force the distributed path (tests do,
    to pin both paths to the same labeling); that path persists the edge
    frame too — the symmetric union consumes it TWICE (once per
    direction), and an unpersisted upstream (e.g. a Jaccard candidate
    join) would execute twice inside the one eager checkpoint job.

    ``checkpoint_dir``: when set, fixpoint rounds checkpoint RELIABLY to
    that directory (``sparkContext.setCheckpointDir`` +
    ``DataFrame.checkpoint``) instead of to executor-local storage.
    """
    node_field = pairs.schema[src]
    clean = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    cached = None
    if driver_max_edges > 0:
        cached = clean.persist(StorageLevel.MEMORY_AND_DISK)
        # Arrow batch -> primitive columns: no per-row Row objects
        pdf = cached.limit(driver_max_edges + 1).toPandas()
        if len(pdf) <= driver_max_edges:
            cached.unpersist()
            nodes, labels = _driver_union_find(
                zip(pdf["a"].tolist(), pdf["b"].tolist())
            )
            return local_frame(
                pairs.sparkSession,
                list(zip(nodes, labels)),
                T.StructType(
                    [
                        T.StructField("node", node_field.dataType, True),
                        T.StructField("cluster_rep", node_field.dataType, True),
                    ]
                ),
            )
        clean = cached
    else:
        # forced-distributed path: the symmetric union below scans
        # ``clean`` twice — persist so the upstream computes once
        cached = clean.persist(StorageLevel.MEMORY_AND_DISK)
        clean = cached
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)

    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()

    edges = ckpt(
        clean.unionByName(
            clean.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    )
    if cached is not None:
        # the eager checkpoint above has consumed the cached edges
        cached.unpersist()
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
