"""Changelog compaction (CDC apply): latest surviving state per key.

The reference re-loads every table in full on each run
(``etl/load_to_query.py:163-169`` — truncate-and-replace). The at-scale
replacement consumes a CHANGE FEED — an append-only log of keyed upserts
and deletes (Debezium/Kafka-compaction shape) — and materializes the
current snapshot: for each key, the payload of the latest change, unless
that latest change is a tombstone, in which case the key is absent.

Spark-first shape: this is ONE hash aggregation, not a window sort.
``max_by(payload_struct, sequence_struct)`` is a declarative aggregate
with a constant-size buffer (one candidate row per key per partition), so
it partial-aggregates map-side and merges — at 100 TB the shuffle carries
one pre-compacted row per key per map partition instead of the full log,
which a ``row_number() OVER (ORDER BY ...)`` window (full sort of every
key's history) cannot do. The DuckDB oracle uses the window form; both
orderings are made total by the (sequence, id) tie-break.

The state is MERGEABLE: ``compact_batch`` emits per-key rows carrying the
max sequence alongside the latest payload and lineage counts, and
``merge_state`` folds any two such slices with the SAME aggregation
(max_by is associative over a total order; counts are sums). That makes
incremental maintenance exact: a streaming ``foreachBatch`` sink merges
each micro-batch's compacted rows into the stored state without ever
rescanning the log (``streaming.pipelines.stream_cdc_compaction``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact_batch(
    changes: DataFrame,
    key_col: str,
    seq_cols: Sequence[str],
    op_col: str,
    delete_op: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Per-key mergeable compaction state for one slice of the feed:
    ``(key, __seq, __last{payload, __op}, n_changes, n_deletes)``.

    ``seq_cols`` must be a TOTAL order within each key (append a unique
    id as the last element — equal sequence values would otherwise make
    "latest" nondeterministic). Slices produced over disjoint subsets of
    the feed merge losslessly via ``merge_state``.
    """
    seq = F.struct(*[F.col(c) for c in seq_cols])
    payload = F.struct(
        *[F.col(c) for c in payload_cols], F.col(op_col).alias("__op")
    )
    is_del: Column = (F.col(op_col) == F.lit(delete_op)).cast("long")
    return changes.groupBy(key_col).agg(
        F.max(seq).alias("__seq"),
        F.max_by(payload, seq).alias("__last"),
        F.count(F.lit(1)).alias("n_changes"),
        F.sum(is_del).alias("n_deletes"),
    )


def merge_state(state: DataFrame, delta: DataFrame, key_col: str) -> DataFrame:
    """Fold two compaction-state slices: latest payload by max sequence,
    lineage counts by sum. Union + the same aggregation — associativity
    of (max, max_by, sum) makes any batching order converge to the
    one-shot result."""
    u = state.unionByName(delta)
    return u.groupBy(key_col).agg(
        F.max("__seq").alias("__seq"),
        F.max_by(F.col("__last"), F.col("__seq")).alias("__last"),
        F.sum("n_changes").alias("n_changes"),
        F.sum("n_deletes").alias("n_deletes"),
    )


def present_state(
    state: DataFrame,
    key_col: str,
    delete_op: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Tombstone-filtered snapshot view of a compaction state: keys whose
    latest change is ``delete_op`` are absent; lineage counts ride along."""
    return state.where(F.col("__last.__op") != F.lit(delete_op)).select(
        key_col,
        *[F.col(f"__last.{c}").alias(f"last_{c}") for c in payload_cols],
        F.col("__last.__op").alias("last_op"),
        "n_changes",
        "n_deletes",
    )


def compact_changelog(
    changes: DataFrame,
    key_col: str,
    seq_cols: Sequence[str],
    op_col: str,
    delete_op: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """One-shot compaction of an append-only change feed to its current
    snapshot: ``compact_batch`` then the tombstone-filtered view. One
    shuffle; map-side partial max_by."""
    return present_state(
        compact_batch(changes, key_col, seq_cols, op_col, delete_op, payload_cols),
        key_col,
        delete_op,
        payload_cols,
    )
