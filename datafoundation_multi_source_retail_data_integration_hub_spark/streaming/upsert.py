"""Streaming warehouse upsert: a file/kafka stream of dimension updates
maintained as an SCD2 table via ``foreachBatch`` — the incremental,
exactly-once replacement for the reference's full-replace dimension loads
(``/root/reference/etl/load_to_query.py:163-169``: drop + rebuild per
run).

Each micro-batch runs the SET-BASED ``scd2_merge`` (no per-row logic) and
atomically replaces the dimension. The read-modify-write cycle is
decoupled with an eager ``localCheckpoint`` so the new table can
overwrite the files the merge just read. At cluster scale the same
``foreachBatch`` body targets a transactional format (Delta/Iceberg
``MERGE INTO``) instead of overwrite — the merge plan is unchanged;
only the final writer swaps. The stream checkpoint makes ingestion
exactly-once across restarts: a re-run with the same checkpoint
re-processes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd2 import SCD2Config, scd2_initial_load, scd2_merge
from ..sources import writers as W


def scd2_stream_upsert(
    stream: DataFrame,
    cfg: SCD2Config,
    table: str,
    database: str,
    effective_date: str,
    checkpoint: str,
) -> StreamingQuery:
    """Start an ``availableNow`` upsert run: every pending micro-batch is
    merged into ``database.table`` (created on first batch) with
    ``effective_date`` stamped on new/expired versions, then the query
    drains and stops. Call again (same checkpoint, fresh effective date)
    when new source files arrive — only unseen input is processed.
    """

    owner = stream.sparkSession  # the session that started the stream

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        W.ensure_database(spark, database)
        if W.table_exists(spark, table, database):
            existing = W.read_table(spark, table, database)
            dim = scd2_merge(existing, batch, cfg, effective_date)
        else:
            dim = scd2_initial_load(batch, cfg, effective_date)
        # materialize BEFORE overwriting the table the merge reads from
        dim = dim.localCheckpoint(eager=True)
        W.write_table(dim, table, mode="overwrite", database=database)
        # drop cached file listings so later reads re-list instead of
        # chasing the replaced parquet parts; micro-batches run on a
        # CLONED session whose relation cache is separate from the
        # stream owner's, so both must refresh
        for s in (spark, owner):
            s.catalog.refreshTable(f"{database}.{table}")

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
