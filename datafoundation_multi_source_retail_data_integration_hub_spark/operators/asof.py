"""As-of (temporal) join: attach to each left row the latest right row
at-or-before it (or earliest at-or-after), matched on equality keys.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); the classic
distributed construction is the tagged UNION + running window:

1. project both sides onto (keys, event time, side tag, payload struct),
2. union, 3. one exchange on the equality keys, 4. a single running
   ``last(payload, ignorenulls)`` window ordered by (time, side),
5. keep the left rows and unpack the carried payload.

Scale shape: ONE shuffle on the join keys total (the window reuses the
union's hash partitioning), versus a naive inequality join which Spark
plans as SortMergeJoin on the keys plus a per-key scan of ALL earlier
right rows (quadratic in rows-per-key). The window frame is
``unboundedPreceding..currentRow`` — a *running* frame that WindowExec
evaluates incrementally with O(1) state per row, never buffering the
whole partition. Hot keys behave like any skewed exchange (AQE split /
salting both apply).

Determinism: right-side ties on (keys, time) are broken by ``tie_break``
— GREATEST wins in the backward direction, SMALLEST in the forward
direction (each is the value "closest past the boundary" in its scan
order; pinned by tests/test_asof_rangejoin.py) — so the result is a pure
function of the inputs, required because the driver hash-compares
results against a DuckDB ``ASOF JOIN`` oracle whose kept row is
otherwise arbitrary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tie_break: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join.

    ``backward`` (default): latest right row with right_ts <= left_ts.
    ``forward``: earliest right row with right_ts >= left_ts.
    Equal timestamps match in both directions (DuckDB ASOF parity).

    Returns every left row (left-outer) with the matched right row's
    non-key columns appended (NULL when no match, or when the match is
    further than ``tolerance_seconds`` away).

    Column names outside ``on`` must be disjoint between the two sides.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(clash)}")

    lv_type = left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
    rv_type = right.select(F.struct(*rcols).alias("s")).schema["s"].dataType

    # side=0 sorts right rows before left rows at equal time, so an exact
    # timestamp tie is visible to the left row (at-or-before includes =).
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lv_type).alias("__lv"),
        F.struct(*rcols).alias("__rv"),
    )
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__lv"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )

    # Right-side tie rank: among right rows sharing (keys, __t), the
    # winner must sort LAST so the running last() picks it.
    tie: Column = (
        F.col(f"__rv.{tie_break}") if tie_break is not None else F.lit(0)
    )
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(), tie.asc_nulls_first()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc(), tie.desc_nulls_first()]

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        tagged_r.unionByName(tagged_l)
        .withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__t").cast("double") - F.col(f"__m.{right_ts}").cast("double")
        )
        carried = carried.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__m"))
        )

    return carried.select(
        *keys,
        *[F.col(f"__lv.{c}").alias(c) for c in lcols],
        *[F.col(f"__m.{c}").alias(c) for c in rcols],
    )
