"""Declarative star-schema build plan.

The reference drives its whole warehouse from two config dicts —
``DIMENSIONS`` and ``FACT_TABLE`` (``etl/load_to_query.py:16-42``) — and a
loop that interprets them. This module keeps that declarative shape (it is
the reference's only 'IR') but interprets it into lazy DataFrame
transforms that Catalyst optimizes as one plan.

Reference semantics preserved:
- dims only use columns present in the source (schema-drift tolerance,
  ``load_to_query.py:88-91,184``) — specs intersect with ``df.columns``;
- a dim whose columns are entirely absent is skipped (the dead
  ``dim_store`` path);
- dim members are project + distinct; surrogate keys are sequential in
  natural-key order; SCD2 dims version on attribute change;
- the date dimension is derived as a continuous calendar, keyed by a
  yyyyMMdd int;
- the fact resolves each dim's natural key to its *current* surrogate key
  by a left join against a dedup'd key map (``load_to_query.py:173-193``)
  — broadcast-shaped by construction: the map has one row per current
  member regardless of fact size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import build_calendar, date_key
from ..operators.scd2 import (
    SCD2Config,
    current_key_map,
    scd2_initial_load,
    scd2_merge,
)


@dataclass(frozen=True)
class DimensionSpec:
    name: str
    columns: tuple[str, ...]  # first = natural key (reference convention)
    surrogate_key: str
    scd2: bool = False

    @property
    def natural_key(self) -> str:
        return self.columns[0]

    def scd2_config(self, columns_present: tuple[str, ...]) -> SCD2Config:
        return SCD2Config(
            natural_key=columns_present[0],
            compare_cols=tuple(columns_present[1:]),
            surrogate_key=self.surrogate_key,
        )


@dataclass(frozen=True)
class FactSpec:
    name: str
    measure_columns: tuple[str, ...]
    # fact column holding each dim's natural key, keyed by dim name
    dim_keys: dict[str, str] = field(default_factory=dict)
    date_column: str | None = None  # resolved to the yyyyMMdd int date_key


@dataclass
class StarSchema:
    dimensions: dict[str, DataFrame]
    fact: DataFrame


def build_dimension(
    src: DataFrame, spec: DimensionSpec, effective_date: str
) -> DataFrame | None:
    """Initial-load one dimension from a staging DataFrame.

    Returns None when none of the spec's columns exist in the source (the
    reference silently skips such dims — its dead ``dim_store`` config).
    """
    present = tuple(c for c in spec.columns if c in src.columns)
    if not present:
        return None
    cfg = spec.scd2_config(present)
    return scd2_initial_load(src, cfg, effective_date)


def merge_dimension(
    existing: DataFrame, src: DataFrame, spec: DimensionSpec, effective_date: str
) -> DataFrame:
    """Incremental batch into an existing dim (SCD2 dims version; non-SCD2
    dims follow the same merge — new members get new keys, changed members
    version — matching the reference, which runs every dim through the
    same SCD2 routine)."""
    present = tuple(c for c in spec.columns if c in src.columns)
    if not present:
        # batch lost every column of this dim (build_dimension's skip
        # case): nothing to merge — the existing dim stands unchanged
        return existing
    if set(present) != {c for c in spec.columns if c in existing.columns}:
        # a PARTIAL subset would rebuild the merge config from the
        # shrunken column list and scd2_merge's final projection would
        # silently DROP the missing column from every historical row —
        # schema drift between batches must be explicit, not data loss
        raise ValueError(
            f"merge_dimension({spec.name}): batch columns {present} do not "
            "match the existing dimension's member columns — "
            "a partial batch cannot merge without losing history"
        )
    cfg = spec.scd2_config(present)
    return scd2_merge(existing, src, cfg, effective_date)


def resolve_fact(
    src: DataFrame,
    fact_spec: FactSpec,
    dims: dict[str, DataFrame],
    dim_specs: dict[str, DimensionSpec],
    dedup_key_map: bool = False,
) -> DataFrame:
    """Build the fact table: project measures + resolve FK surrogate keys.

    Each dim key map is one row per current member. Broadcast policy
    (see queries/relational.py module doc): dims like customer/part
    scale WITH the corpus, so the key-map joins carry NO hard
    ``broadcast()`` hint — Catalyst's size estimate + AQE's runtime
    re-plan choose broadcast-hash at test scale and degrade to
    shuffle-hash/sort-merge for billion-row dims at the 100 TB design
    point, where a hard hint would OOM the executors. The left join
    stays key-map-sized per dim either way; the fact never shuffles
    more than once per unresolved FK.

    Reference parity note: the reference's key map keeps ALL current rows
    (``load_to_query.py:173-176``), so a natural key with several current
    members (e.g. one product_id mapping to two names in the Superstore
    data) fans the left join out — faithful default. Pass
    ``dedup_key_map=True`` for the sane variant (min surrogate per key).
    """
    keep = [c for c in fact_spec.measure_columns if c in src.columns]
    key_cols = [c for c in fact_spec.dim_keys.values() if c in src.columns]
    # tolerate an absent date column the same way absent dims/measures
    # are tolerated (the select below would otherwise raise)
    if fact_spec.date_column and fact_spec.date_column in src.columns:
        key_cols.append(fact_spec.date_column)
    fact = src.select(*dict.fromkeys(key_cols + keep))

    for dim_name, fact_nk in fact_spec.dim_keys.items():
        if dim_name not in dims or fact_nk not in fact.columns:
            continue
        spec = dim_specs[dim_name]
        present = tuple(c for c in spec.columns if c in dims[dim_name].columns)
        cfg = spec.scd2_config(present)
        kmap = current_key_map(dims[dim_name], cfg)
        if dedup_key_map:
            kmap = kmap.groupBy(cfg.natural_key).agg(
                F.min(cfg.surrogate_key).alias(cfg.surrogate_key)
            )
        if cfg.natural_key != fact_nk:
            kmap = kmap.withColumnRenamed(cfg.natural_key, fact_nk)
        fact = fact.join(kmap, fact_nk, "left").drop(fact_nk)

    if fact_spec.date_column and fact_spec.date_column in fact.columns:
        # The reference stores the int date_key under the fact's original
        # date column name (SURVEY §2.3 naming quirk) — keep that contract.
        fact = fact.withColumn(
            fact_spec.date_column, date_key(F.col(fact_spec.date_column))
        )
    return fact


def build_star_schema(
    staging: DataFrame,
    dim_specs: list[DimensionSpec],
    fact_spec: FactSpec,
    effective_date: str,
    date_source_col: str | None = None,
) -> StarSchema:
    """One-shot initial warehouse build (reference ``load_to_bigquery``)."""
    dims: dict[str, DataFrame] = {}
    for spec in dim_specs:
        built = build_dimension(staging, spec, effective_date)
        if built is not None:
            dims[spec.name] = built
    if date_source_col:
        dims["dim_date"] = build_calendar(staging, date_source_col)
    fact = resolve_fact(
        staging, fact_spec, dims, {s.name: s for s in dim_specs}
    )
    return StarSchema(dimensions=dims, fact=fact)
