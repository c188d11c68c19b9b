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
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact_changelog(
    changes: DataFrame,
    key_col: str,
    seq_cols: Sequence[str],
    op_col: str,
    delete_op: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Compact an append-only change feed to its current snapshot.

    ``seq_cols`` must be a TOTAL order within each key (append a unique
    id as the last element — equal sequence values would otherwise make
    "latest" nondeterministic). Output: one row per surviving key with
    the latest payload plus ``n_changes`` / ``n_deletes`` lineage counts;
    keys whose latest change is ``delete_op`` are tombstoned out.
    """
    seq = F.struct(*[F.col(c) for c in seq_cols])
    last = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols], F.col(op_col).alias("__op")),
        seq,
    )
    is_del: Column = (F.col(op_col) == F.lit(delete_op)).cast("long")
    compacted = changes.groupBy(key_col).agg(
        last.alias("__last"),
        F.count(F.lit(1)).alias("n_changes"),
        F.sum(is_del).alias("n_deletes"),
    )
    return compacted.where(F.col("__last.__op") != F.lit(delete_op)).select(
        key_col,
        *[F.col(f"__last.{c}").alias(f"last_{c}") for c in payload_cols],
        F.col("__last.__op").alias("last_op"),
        "n_changes",
        "n_deletes",
    )
