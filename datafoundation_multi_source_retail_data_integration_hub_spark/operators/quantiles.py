"""Exact interpolated quantiles via distributed ORDER STATISTICS.

The engine's exact-quantile queries (drift screen, equi-depth histogram,
percentile report) originally aggregated the whole column into one
``sorted_vals`` array buffer — bit-exact vs the DuckDB ``quantile_cont``
oracle, but a single-task reduce whose buffer grows with the data
(guarded by ``SORTED_VALS_MAX``). This module computes the SAME values
from order statistics: only the <=2*len(probs) rows whose global rank is
a floor/ceil neighbor of a quantile position ever leave the executors,
and the interpolation runs driver-side with the identical IEEE-754
operation sequence as ``functions.parity.quantile_interp``::

    pos  = p * (n - 1)            # double multiply
    edge = v[floor(pos)]                       if floor == ceil
         = (hi - pos)*v[lo] + (pos - lo)*v[hi] otherwise

(the same form DuckDB's quantile_cont uses, validated raw-bit across
rounds — see ARCHITECTURE.md "Cross-engine determinism toolkit").

Plan: an exact count first (cheap — map-side count over the scan), so
the <=2*len(probs) needed ranks are LITERALS in the rank filter, then:

- bench scale (Catalyst row estimate under ``SMALL_DIM_THRESHOLD``): a
  single-partition window ranks and filters in one job (measured: an
  n-as-window-count variant that avoided the count job lost ~0.5s to
  the unbounded count frame at 600k rows — literal ranks win);
- at scale: the two-phase distributed numbering from ``operators.keys``
  (range partition + per-partition offsets) — no task ever holds more
  than its range slice.

Duplicate values are fine: the k-th smallest VALUE is well-defined under
any tie order, and only (rank, value) pairs leave the job.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .keys import SMALL_DIM_THRESHOLD, with_global_row_number

__all__ = ["exact_quantile_edges"]


def exact_quantile_edges(
    values: DataFrame, col: str, probs: list[float]
) -> list[float]:
    """Exact interpolated quantiles of ``values[col]`` at each ``p`` in
    ``probs``, bit-identical to ``quantile_interp`` over the sorted
    column (and therefore to the DuckDB ``quantile_cont`` oracle).
    Returns [] on empty input."""
    # NULLs are excluded, matching quantile_cont (unfiltered, they would
    # count into n AND sort into the lowest ranks — wrong edges, or a
    # float(None) crash when a needed rank lands on a NULL)
    v = values.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    n = v.count()
    if n == 0:
        return []
    need = set()
    for p in probs:
        pos = p * float(n - 1)
        need.add(math.floor(pos) + 1)
        need.add(math.ceil(pos) + 1)
    if n <= SMALL_DIM_THRESHOLD:
        ranked = v.select("v", F.row_number().over(Window.orderBy("v")).alias("rk"))
    else:
        ranked = with_global_row_number(v, ["v"], "rk", force_distributed=True)
    rows = (
        ranked.where(F.col("rk").isin(sorted(need))).select("rk", "v").collect()
    )
    at = {r["rk"]: r["v"] for r in rows}
    edges = []
    for p in probs:
        pos = p * float(n - 1)
        lo = math.floor(pos)
        hi = math.ceil(pos)
        base = at[lo + 1]
        if hi == lo:
            edges.append(float(base))
        else:
            upper = at[hi + 1]
            edges.append((float(hi) - pos) * base + (pos - float(lo)) * upper)
    return edges
