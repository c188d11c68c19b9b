"""Set-based SCD Type 2 dimension merge.

Reproduces the reference's SCD2 semantics (``etl/load_to_query.py:96-151``)
as joins + unions instead of a row-at-a-time ``iterrows`` loop:

- natural key = first configured column; compare-columns = the rest
  (``load_to_query.py:120,137``).
- Initial load: every distinct member gets surrogate keys 1..n,
  ``effective_date = load_date``, ``expiry_date = NULL``, ``is_current = 1``
  (``:109-115``).
- Incremental: unmatched natural key -> insert new member with next key
  (``:125-134``); matched + any compare-column differs -> expire current
  row (``expiry_date = load_date``, ``is_current = 0``) and insert a new
  version with the next key (``:136-151``); matched + unchanged -> no-op.

Deviation (documented, SURVEY §4.3): the reference numbers new keys in
source row order; we number in natural-key order (deterministic under
parallelism). Correctness checks are order-insensitive so this is safe.

Scale: the probe side (incoming batch) joins the current dim slice on the
natural key — a plain hash join Catalyst can broadcast when the dim is
small or shuffle-hash otherwise; change detection is a null-safe column
comparison (optionally an md5 row-hash, reference ``README.md:300-311``),
all JVM-side expressions. No Python hits the row path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .keys import with_global_row_number


@dataclass(frozen=True)
class SCD2Config:
    """Column contract for one SCD2 dimension.

    ``natural_key``: business key (first configured column in the
    reference's dict). ``compare_cols``: attributes whose change spawns a
    new version. ``surrogate_key``: warehouse key column name.
    """

    natural_key: str
    compare_cols: tuple[str, ...]
    surrogate_key: str
    effective_col: str = "effective_date"
    expiry_col: str = "expiry_date"
    current_col: str = "is_current"

    @property
    def member_cols(self) -> list[str]:
        return [self.natural_key, *self.compare_cols]


def _members(src: DataFrame, cfg: SCD2Config) -> DataFrame:
    """Project + dedup the incoming batch to distinct dimension members
    (reference ``load_to_query.py:93``)."""
    return src.select(*cfg.member_cols).dropDuplicates()


def _with_flags(df: DataFrame, cfg: SCD2Config, effective_date: str) -> DataFrame:
    return (
        df.withColumn(cfg.effective_col, F.lit(effective_date).cast("date"))
        .withColumn(cfg.expiry_col, F.lit(None).cast("date"))
        .withColumn(cfg.current_col, F.lit(1))
    )


def scd2_initial_load(
    src: DataFrame, cfg: SCD2Config, effective_date: str
) -> DataFrame:
    """First-ever load: number all distinct members 1..n in natural-key
    order (reference ``load_to_query.py:109-115``)."""
    members = _members(src, cfg)
    keyed = with_global_row_number(members, cfg.member_cols, cfg.surrogate_key)
    return _with_flags(keyed, cfg, effective_date).select(
        *cfg.member_cols,
        cfg.surrogate_key,
        cfg.effective_col,
        cfg.expiry_col,
        cfg.current_col,
    )


def scd2_merge(
    existing: DataFrame, incoming: DataFrame, cfg: SCD2Config, effective_date: str
) -> DataFrame:
    """Incremental merge of a new batch into an existing SCD2 dimension.

    Returns the complete new dimension table: untouched history + expired
    versions + surviving current rows + newly inserted versions.
    """
    nk = cfg.natural_key
    inc = _members(incoming, cfg)
    current = existing.filter(F.col(cfg.current_col) == 1)
    cur_members = current.select(*cfg.member_cols)
    cur_keys = current.select(nk).distinct()

    def tuple_eq(left: DataFrame, right: DataFrame) -> F.Column:
        """Null-safe full-member equality join condition. Matching must be
        on the whole tuple: an initial load can legally hold several member
        variants per natural key (Superstore does), and key-only change
        detection would re-insert already-present members on every re-merge
        (breaking idempotence)."""
        cond = F.lit(True)
        for c in cfg.member_cols:
            cond = cond & left[c].eqNullSafe(right[c])
        return cond

    new_members = inc.join(cur_keys, nk, "left_anti")
    matched = inc.join(cur_keys, nk, "left_semi")
    # changed: natural key exists but no current variant equals the tuple
    changed_members = matched.join(
        cur_members, tuple_eq(matched, cur_members), "left_anti"
    )

    changed_keys = changed_members.select(nk).distinct()
    # expire: current variants of changed keys NOT re-asserted by the
    # incoming batch (a re-asserted identical variant stays current)
    # changed_keys is batch-delta-sized — usually tiny, but a batch can
    # legally rewrite the whole dimension, so no hard broadcast() hint
    # (policy: queries/relational.py module doc); AQE decides.
    expired_base = current.join(changed_keys, nk, "left_semi")
    expired = (
        expired_base.join(inc, tuple_eq(expired_base, inc), "left_anti")
        .withColumn(cfg.expiry_col, F.lit(effective_date).cast("date"))
        .withColumn(cfg.current_col, F.lit(0))
    )
    # carry: every existing row except the ones expired above
    expired_sks = expired.select(F.col(cfg.surrogate_key).alias("__esk"))
    carried = existing.join(
        expired_sks,
        existing[cfg.surrogate_key] == expired_sks["__esk"],
        "left_anti",
    )

    # prior max surrogate as a LAZY 1-row aggregate, broadcast onto the
    # numbered inserts — the old eager `.first()` here ran the whole
    # `existing` pipeline as a separate driver-blocking job per merge
    # (an extra full pass over the dimension at any scale) before the
    # real plan even started; as part of the plan it is one
    # column-pruned agg the scheduler overlaps with everything else
    prior_max_df = existing.agg(
        F.coalesce(F.max(cfg.surrogate_key), F.lit(0))
        .cast("bigint")
        .alias("__prior_max")
    )
    inserts = new_members.unionByName(changed_members)
    keyed_inserts = (
        with_global_row_number(inserts, cfg.member_cols, cfg.surrogate_key)
        .crossJoin(F.broadcast(prior_max_df))
        .withColumn(
            cfg.surrogate_key,
            (F.col(cfg.surrogate_key) + F.col("__prior_max")).cast("bigint"),
        )
        .drop("__prior_max")
    )
    new_rows = _with_flags(keyed_inserts, cfg, effective_date)

    out_cols = [
        *cfg.member_cols,
        cfg.surrogate_key,
        cfg.effective_col,
        cfg.expiry_col,
        cfg.current_col,
    ]
    return (
        carried.select(*out_cols)
        .unionByName(expired.select(*out_cols))
        .unionByName(new_rows.select(*out_cols))
    )


def current_key_map(dim: DataFrame, cfg: SCD2Config) -> DataFrame:
    """natural key -> surrogate key map over current rows (reference
    ``load_to_query.py:173-176``) — the broadcast build side for fact FK
    resolution."""
    return dim.filter(F.col(cfg.current_col) == 1).select(
        cfg.natural_key, cfg.surrogate_key
    )


def add_row_hash(df: DataFrame, cols: list[str], out: str = "row_hash") -> DataFrame:
    """md5 change-detection hash over ``cols`` (reference ``README.md:300-311``).

    NULLs are mapped to a sentinel before concat so NULL and empty string
    hash differently (``concat_ws`` silently drops NULLs otherwise).
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    return df.withColumn(out, F.md5(F.concat_ws("|", *parts)))
