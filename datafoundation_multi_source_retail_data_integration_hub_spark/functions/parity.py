"""Cross-engine float-aggregate parity helpers.

Double addition is order-dependent; Spark's partial aggregation visits
rows in a different order than any other engine, so ``round(sum(x), 4)``
can land on opposite sides of a rounding midpoint (observed ~1 in 8k
groups on real data, because business values have few decimals and their
sums sit exactly on 4-decimal midpoints).

Fix: accumulate in ``DECIMAL(27,6)``.

- double -> decimal(…,6) conversion is deterministic and engine-agnostic:
  a binary double can never be exactly equidistant between two 6-decimal
  values (odd multiples of 5e-7 are not dyadic rationals), so
  round-to-nearest has a unique answer in every engine.
- decimal addition is exact and associative -> identical sums regardless
  of visit order.
- the final cast back to double and round(…, 4) then operate on identical
  inputs everywhere.

Cost: decimal aggregation skips some codegen fast paths — use these only
where a float aggregate feeds an oracle-compared (or order-sensitive)
result. 21 integer digits of headroom keeps 100 TB-scale sums safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"
ROUND = 4


def stable_sum(c: Column) -> Column:
    """Order-independent sum of a double column, rounded to 4."""
    return F.round(F.sum(c.cast(DEC)).cast("double"), ROUND)


def stable_sum_raw(c: Column) -> Column:
    """Order-independent sum as an un-rounded double (for downstream
    arithmetic that must stay deterministic, e.g. shares/growth)."""
    return F.sum(c.cast(DEC)).cast("double")


def stable_avg(c: Column) -> Column:
    """Order-independent mean: exact decimal sum / non-null count."""
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), ROUND)


# --- DuckDB SQL twins ------------------------------------------------------


def sql_stable_sum(expr: str) -> str:
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE), {ROUND})"


def sql_stable_sum_raw(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def sql_stable_avg(expr: str) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"
        f" / count({expr}), {ROUND})"
    )
