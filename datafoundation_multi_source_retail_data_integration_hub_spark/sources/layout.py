"""Data-layout clustering for scan-time file skipping.

The reference loads its warehouse tables unordered (full-replace loads,
``etl/load_to_query.py:163-169``) — fine at its row counts, fatal at
100 TB where the scan cost of a selective query is decided by DATA
LAYOUT, not by the filter: parquet (and every file-level index built on
it — Delta/Iceberg stats, zone maps) can only skip a file when the
file's [min, max] envelope for the filtered column misses the predicate.

Two layouts, both "pay one shuffle at write time, skip forever after":

- **Range clustering** (``write_range_clustered``): global sort order on
  the leading column(s) via ``repartitionByRange`` +
  ``sortWithinPartitions``. Each file covers a disjoint slice of the
  leading column → near-perfect skipping on that column, none on any
  other.
- **Z-order clustering** (``write_zordered``): rows ordered by the
  Morton (bit-interleaved) code of TWO columns. Each file's envelope is
  then tight in BOTH dimensions (~sqrt(n_files) files overlap a point
  query per dimension), which is the layout you want when queries
  filter on either or both of two columns and you can only sort once.

The Morton code is built as ONE parsed SQL expression (driver time is a
hot path — see ARCHITECTURE.md): 16-bit per-dimension spread via the
standard mask-shift cascade, dimensions normalized to [0, 65535] with an
affine min/max map. Column domains come from the caller (at cluster
scale: table statistics / metastore column stats — the write must not
pay a full pre-scan); ``column_domains`` computes them with one tiny
aggregate when no stats exist.

``file_skipping_report`` measures the payoff the way a file-index would:
per-file min/max envelopes (one groupBy over ``input_file_name()``)
intersected with a predicate box — files whose envelope misses the box
are never opened by a stats-aware reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 16-bit -> 32-bit bit-spread (x | x<<8 ...) & mask cascade; operands stay
# BIGINT throughout (Spark's bitwise ops on BIGINT), so the final
# interleave of two 32-bit spreads fits comfortably in 64 bits.
_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16_sql(expr: str) -> str:
    """SQL for the 16-bit Morton bit-spread of ``expr`` (inserts a 0 bit
    between consecutive bits: 0bABCD -> 0b0A0B0C0D).

    Size boundary: each cascade step references the previous step TWICE,
    so the emitted text holds 2^len(_SPREAD_MASKS) = 16 copies of the
    scale expression per dimension — bounded and parse-cheap at the
    16-bit/4-step cascade (whole-stage codegen's subexpression
    elimination evaluates it once per row). Widening to a 24/32-bit
    spread must NOT extend this doubling (named staging through
    withColumn does not help either — CollapseProject re-inlines cheap
    multi-referenced aliases); use a codegen-friendly reformulation or
    accept a UDF at that point."""
    out = f"({expr})"
    for shift, mask in _SPREAD_MASKS:
        out = f"((({out} | shiftleft({out}, {shift}))) & {mask})"
    return out


def _scale16_sql(col: str, lo: float, hi: float) -> str:
    """Affine map of ``col`` from [lo, hi] to an integer in [0, 65535].

    Uses the same floor form as functions/parity.round_dp (no builtin
    round in any compared path); values outside the declared domain are
    clamped so a stale stats range degrades skipping, never correctness.
    """
    span = float(hi) - float(lo)
    if span <= 0:  # constant column: every row maps to bucket 0
        return "CAST(0 AS BIGINT)"
    scaled = f"CAST(FLOOR(((CAST({col} AS DOUBLE) - {float(lo)!r}) / {span!r}) * 65535.0 + 0.5) AS BIGINT)"
    return f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST(65535 AS BIGINT), {scaled}))"


def zorder_key(
    col_x: str,
    col_y: str,
    domains: dict[str, tuple[float, float]],
):
    """Morton (Z-order) code of two numeric columns as a single Column.

    ``domains`` maps each column name to its (min, max); the whole key is
    one ``F.expr`` parse — zero py4j Column-chain cost at construction.
    """
    sx = _spread16_sql(_scale16_sql(col_x, *domains[col_x]))
    sy = _spread16_sql(_scale16_sql(col_y, *domains[col_y]))
    return F.expr(f"({sx} | shiftleft({sy}, 1))")


def column_domains(df: DataFrame, cols: tuple[str, ...]) -> dict[str, tuple[float, float]]:
    """(min, max) per column via ONE aggregate — constant-size driver
    state (2 scalars per column). At cluster scale prefer metastore /
    Delta column stats; this is the no-stats fallback and costs one
    column-pruned scan of only ``cols``."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    for c in cols:
        if row[f"__min_{c}"] is None:
            # empty input or an all-NULL clustering column: no domain
            # exists — raise the actual condition instead of a bare
            # float(None) TypeError deep in the key expression
            raise ValueError(
                f"column_domains: no non-NULL values in {c!r} "
                "(empty frame or all-NULL column) — nothing to cluster on"
            )
    return {c: (float(row[f"__min_{c}"]), float(row[f"__max_{c}"])) for c in cols}


def write_range_clustered(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    n_files: int,
) -> None:
    """Linear layout: global range partition + in-file sort on ``cols``.

    ``repartitionByRange`` samples split points (one pass over the sort
    keys), so each of the ``n_files`` output files covers a disjoint
    range of the leading column — a later filter on it overlaps O(1)
    file envelopes. The in-file sort additionally tightens parquet
    row-group stats inside each file."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int,
    domains: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Z-order layout: range partition + sort on the Morton code of
    (``col_x``, ``col_y``), then drop the key — layout is carried by row
    order, not by a stored column."""
    if domains is None:
        domains = column_domains(df, (col_x, col_y))
    key = zorder_key(col_x, col_y, domains)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_envelopes(spark: SparkSession, path: str, cols: tuple[str, ...]) -> DataFrame:
    """Per-file [min, max] envelope of ``cols`` — the zone-map a
    stats-aware reader (or Delta/Iceberg manifest) consults before
    opening a file. One column-pruned scan + one groupBy on
    ``input_file_name()``; output is n_files rows."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def file_skipping_report(
    spark: SparkSession,
    path: str,
    box: dict[str, tuple[float, float]],
) -> tuple[int, int]:
    """(files_overlapping_box, total_files) for a conjunctive range
    predicate ``box`` — exactly the files a min/max index must open. The
    overlap test runs on the n_files-row envelope frame, not the data."""
    env = file_envelopes(spark, path, tuple(box))
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"min_{c}") <= F.lit(hi)) & (F.col(f"max_{c}") >= F.lit(lo))
    counts = env.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(cond, 1).otherwise(0)).alias("hit"),
    ).collect()[0]
    return int(counts["hit"]), int(counts["total"])
