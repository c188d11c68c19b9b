"""Incremental view maintenance (IVM) for sum/count-mergeable marts.

The reference rebuilds its marts from scratch on every load
(`/root/reference/etl/load_to_query.py:163-169` full-replace semantics);
at 100 TB a mart is never rebuilt — each ingest batch aggregates ITS OWN
rows to group partials and merges them into the stored mart. This module
is the reusable core behind ``queries/warehouse.py::
mart_incremental_refresh`` and ``streaming/pipelines.py::
stream_mart_refresh``:

- **State is exact and mergeable**: per-measure LONG fixed-point unit
  totals stored as DECIMAL(38,0) (``functions.parity.fixed_units_total``)
  plus a row count. Merging = plain addition, associative and
  order-independent, so any batch arrival order converges to the same
  bits as a one-shot aggregation. A ROUNDED double partial does NOT have
  this property (4-decimal midpoints drift — pinned by
  tests/test_fixed_point_parity.py::test_fixed_units_total_merges_across_batches).
- **Refreshes are batch-keyed** through the ``etl_run_log`` audit table
  (``pipelines/audit.py``): re-applying an already-applied batch id is a
  guarded no-op, so at-least-once delivery (stream replays, retried
  jobs) cannot double-count.
- **Presentation rounds the merged state** with the same decimal-divide
  -> double -> ``round_dp`` sequence as ``fixed_sum``, so the presented
  mart is bit-identical to a one-shot build — which is what the DuckDB
  oracles check.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import fixed_units_total, round_dp

_STATE_DEC = "decimal(38,0)"


@dataclass(frozen=True)
class IVMConfig:
    """Column contract for one incrementally-maintained mart.

    ``group_cols``: mart grain. ``unit_cols``: LONG fixed-point unit
    columns on the input rows (built with ``fixed_units``); each gets a
    ``<name>_total`` DECIMAL(38,0) state column. ``dp``: the unit scale,
    used at presentation time. ``count_col``: row-count state column.
    """

    group_cols: tuple[str, ...]
    unit_cols: tuple[str, ...]
    dp: int = 4
    count_col: str = "n_rows"

    def state_cols(self) -> list[str]:
        return [f"{c}_total" for c in self.unit_cols]


def state_partials(batch: DataFrame, cfg: IVMConfig) -> DataFrame:
    """One batch's rows -> exact mergeable group partials."""
    aggs = [
        fixed_units_total(c).alias(f"{c}_total") for c in cfg.unit_cols
    ]
    aggs.append(F.count(F.lit(1)).alias(cfg.count_col))
    return batch.groupBy(*cfg.group_cols).agg(*aggs)


def merge_state(stored: DataFrame, partial: DataFrame, cfg: IVMConfig) -> DataFrame:
    """Merge a batch's partials into the stored state — mart-sized +
    batch-sized rows move; the historical fact is never rescanned."""
    aggs = [
        F.sum(c).cast(_STATE_DEC).alias(c) for c in cfg.state_cols()
    ]
    aggs.append(F.sum(cfg.count_col).alias(cfg.count_col))
    return (
        stored.unionByName(partial).groupBy(*cfg.group_cols).agg(*aggs)
    )


def present(state: DataFrame, cfg: IVMConfig) -> DataFrame:
    """Rounded view over the exact state — the same decimal-divide ->
    double -> round sequence as ``fixed_sum``, so presented values are
    bit-identical to a one-shot aggregation."""
    scale = F.lit(10**cfg.dp).cast("decimal(7,0)")
    cols = [F.col(c) for c in cfg.group_cols]
    cols += [
        round_dp((F.col(f"{c}_total") / scale).cast("double")).alias(
            f"total_{c.removesuffix('_u')}"
        )
        for c in cfg.unit_cols
    ]
    cols.append(F.col(cfg.count_col))
    return state.select(*cols)


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: str,
    table: str,
    database: str,
    cfg: IVMConfig,
    ts: datetime,
) -> bool:
    """Merge one batch into the stored mart state, batch-keyed through
    the audit table: returns False (no-op) when ``batch_id`` was already
    applied — the idempotence contract for at-least-once delivery."""
    from ..pipelines.audit import RUN_LOG_TABLE, RunLogEntry, log_run
    from ..sources import writers as W

    W.ensure_database(spark, database)
    if W.table_exists(spark, RUN_LOG_TABLE, database):
        seen = (
            W.read_table(spark, RUN_LOG_TABLE, database=database)
            .filter(
                (F.col("run_id") == batch_id)
                & (F.col("table_name") == table)
            )
            .limit(1)
            .count()
        )
        if seen:
            return False
    partial = state_partials(batch, cfg)
    if W.table_exists(spark, table, database):
        # materialized: the merge reads the very table the write replaces
        merged = merge_state(
            W.read_table(spark, table, database=database), partial, cfg
        )
    else:
        merged = partial
    # checkpoint BOTH paths: the table write and the audit-count agg
    # below each consume ``merged`` — uncheckpointed, the first batch
    # would pay the full batch aggregation twice
    merged = merged.localCheckpoint(eager=True)
    W.write_table(merged, table, database=database)
    n = merged.agg(F.sum(cfg.count_col)).first()[0]
    log_run(
        spark,
        RunLogEntry(batch_id, table, int(n), "success", ts, ts),
        database=database,
    )
    return True
