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
- the final cast back to double then operates on identical inputs
  everywhere; the 4-decimal rounding itself must use ``round_dp`` below —
  the engines' builtin ``round(double, n)`` functions disagree on
  identical inputs (Spark rounds the shortest decimal repr, DuckDB the
  binary value; see ``round_dp``).

Cost: decimal aggregation skips some codegen fast paths — use these only
where a float aggregate feeds an oracle-compared (or order-sensitive)
result. 21 integer digits of headroom keeps 100 TB-scale sums safe.

``fixed_sum`` below is the fast path to the same contract: when the
caller can assert the column's true decimal scale (money = 2, products
of money = 4), the value is converted to exact integer units in a LONG
(one multiply + round, whole-stage codegen) and summed as three 20-bit
limbs — plain long additions, no BigDecimal anywhere in the per-row
path. The limbs recombine into one exact DECIMAL on the single result
row, so the output is bit-identical to the ``stable_sum`` decimal path
(unit-tested, including 4-decimal rounding midpoints) at ~2.5x the
throughput. Overflow headroom: limb partial sums stay inside a long for
any row count below 2^43 (~8.8e12) per aggregation group and unit
magnitudes below 2^60 — both comfortably past the 100 TB design point
(TPC-H sf100k lineitem is ~6e11 rows; money units <= ~6e13).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"
ROUND = 4

_LIMB_BITS = 20
_LIMB = 1 << _LIMB_BITS  # base-2^20 digit decomposition of the long units


# ---------------------------------------------------------------------------
# Driver-time fast path: every public helper below accepts its input as
# either a Column or a Spark SQL STRING. The string form builds the
# WHOLE expression as one SQL string and issues a single ``F.expr`` —
# one py4j round-trip instead of the ~50 a Column-method chain costs
# (each ``F.col``/operator/cast is an RPC; a seven-aggregate query
# measured 0.55 s of pure driver time in the chained form, ~0.02 s in
# this form — see ARCHITECTURE.md "Driver time is a hot path"). The
# string builders mirror the Column semantics EXACTLY (same Catalyst
# tree after parsing; bit-equality of both paths is pinned by
# tests/test_fixed_point_parity.py and the full oracle sweeps). Columns
# cannot be stringified mechanically (Catalyst's unresolved ``sql()``
# prints operators as unparseable `` `*`(a,b) `` calls), so Column
# inputs keep the original chain — hot query paths pass strings.
# ---------------------------------------------------------------------------


def _d(v: float) -> str:
    """A Spark SQL DOUBLE literal (the bare ``10000.0`` form would parse
    as DECIMAL in Spark — the ``D`` suffix forces IEEE double, keeping
    the arithmetic bit-identical to the Column form's ``F.lit(float)``)."""
    return f"{float(v)!r}D"


def _s_round_dp(x: str, dp: int) -> str:
    f = _d(10**dp)
    y = f"(({x}) * {f} + 0.5D)"
    return (
        f"((CASE WHEN isnan({y}) OR abs({y}) >= {_d(1 << 52)} THEN {y}"
        f" ELSE CAST(floor({y}) AS DOUBLE) END) / {f})"
    )


def _s_fixed_units(x: str, dp: int) -> str:
    return f"CAST(round(({x}) * {10**dp}) AS BIGINT)"


def _s_limb_total(u: str) -> str:
    m = _LIMB - 1
    l0 = f"sum(({u}) & {m})"
    l1 = f"sum(shiftright(({u}), {_LIMB_BITS}) & {m})"
    l2 = f"sum(shiftright(({u}), {2 * _LIMB_BITS}))"
    return (
        f"CAST(CAST({l2} AS DECIMAL(34,0)) * {_LIMB * _LIMB}"
        f" + CAST({l1} AS DECIMAL(34,0)) * {_LIMB}"
        f" + CAST({l0} AS DECIMAL(34,0)) AS DECIMAL(38,0))"
    )


def _s_fixed_sum_dec(x: str, dp: int) -> str:
    return (
        f"({_s_limb_total(_s_fixed_units(x, dp))}"
        f" / CAST({10**dp} AS DECIMAL(7,0)))"
    )


def _s_stable_sum_raw(x: str) -> str:
    return f"CAST(sum(CAST(({x}) AS {DEC})) AS DOUBLE)"


def round_dp(c: Column | str, dp: int = ROUND) -> Column:
    """Cross-engine deterministic rounding of a double to ``dp`` decimals:
    ``floor(x * 10^dp + 0.5) / 10^dp`` in pure IEEE double arithmetic —
    the identical expression in Spark and DuckDB yields identical bits.

    The builtin ``round(double, n)`` functions DISAGREE between the
    engines even on identical inputs: Spark rounds the SHORTEST DECIMAL
    REPRESENTATION (``BigDecimal.valueOf`` goes through
    ``Double.toString``) while DuckDB rounds the binary value. Observed:
    951.27/24 has shortest repr "39.63625" but exact binary value
    39.636249999…, so Spark says 39.6363 and DuckDB 39.6362 — a raw-bit
    oracle mismatch caught by the sf0.1 sweep (events_sliding_10m_5m).
    The floor form's tie rule is half-toward-+inf on the double grid —
    not decimal HALF_UP — but it is the SAME rule in both engines,
    which is the whole parity contract.

    Full-domain: Spark's ``floor(double)`` returns BIGINT, which would
    overflow (and diverge from DuckDB's double-typed floor) once
    |x|*10^dp reaches 2^63. Every double with |y| >= 2^52 is already an
    integer (ulp >= 1), so IEEE floor is the identity there; branching
    on that bound makes this expression exactly DuckDB's
    double-in/double-out floor over the whole double range, NaN and
    +/-inf included, while the |y| < 2^52 branch casts long exactly."""
    if isinstance(c, str):
        return F.expr(_s_round_dp(f"({c})", dp))
    f = F.lit(float(10**dp))
    y = c * f + F.lit(0.5)
    fl = F.when(F.isnan(y) | (F.abs(y) >= F.lit(float(1 << 52))), y).otherwise(
        F.floor(y).cast("double")
    )
    return fl / f


def sql_round_dp(expr: str, dp: int = ROUND) -> str:
    """DuckDB twin of ``round_dp`` — textually the same arithmetic."""
    f = float(10**dp)
    return f"floor(({expr}) * {f!r} + 0.5) / {f!r}"


def stable_sum(c: Column | str) -> Column:
    """Order-independent sum of a double column, rounded to 4."""
    if isinstance(c, str):
        return F.expr(_s_round_dp(_s_stable_sum_raw(f"({c})"), ROUND))
    return round_dp(F.sum(c.cast(DEC)).cast("double"))


def stable_sum_raw(c: Column | str) -> Column:
    """Order-independent sum as an un-rounded double (for downstream
    arithmetic that must stay deterministic, e.g. shares/growth)."""
    if isinstance(c, str):
        return F.expr(_s_stable_sum_raw(f"({c})"))
    return F.sum(c.cast(DEC)).cast("double")


def stable_avg(c: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / non-null count."""
    if isinstance(c, str):
        x = f"({c})"
        return F.expr(
            _s_round_dp(f"({_s_stable_sum_raw(x)} / count({x}))", ROUND)
        )
    return round_dp(F.sum(c.cast(DEC)).cast("double") / F.count(c))


def fixed_units(c: Column | str, dp: int) -> Column:
    """Exact integer units of a double column whose true decimal scale is
    <= ``dp``: ``round(c * 10^dp)`` as a long.

    Domain contract (caller-asserted): |c| * 10^dp < 2^52. Within it the
    result equals the unscaled value of ``CAST(c AS DECIMAL(*, dp))``
    exactly — c is the nearest double to a dp-decimal value, so the
    scaled product lands within a half-unit of the true integer and
    round() recovers it. Long arithmetic on these units (sums, products
    of two unit columns) is then exact and engine-agnostic.
    """
    if isinstance(c, str):
        return F.expr(_s_fixed_units(f"({c})", dp))
    return F.round(c * F.lit(10**dp)).cast("long")


def _limb_total(u: Column | str) -> Column:
    """Exact aggregate total of a long units column as DECIMAL(38,0):
    three long limb sums (codegen fast path), one decimal recombination
    on the result row. Two's-complement identity
    ``u = (u>>40)*2^40 + ((u>>20)&m)*2^20 + (u&m)`` holds for negative
    units as well (arithmetic shift = floor division, masked limbs are
    the non-negative floor-mod digits), so mixed-sign sums are exact."""
    if isinstance(u, str):
        return F.expr(_s_limb_total(f"({u})"))
    mask = F.lit(_LIMB - 1)
    l0 = F.sum(u.bitwiseAND(mask))
    l1 = F.sum(F.shiftright(u, _LIMB_BITS).bitwiseAND(mask))
    l2 = F.sum(F.shiftright(u, 2 * _LIMB_BITS))
    return (
        l2.cast("decimal(34,0)") * F.lit(_LIMB * _LIMB)
        + l1.cast("decimal(34,0)") * F.lit(_LIMB)
        + l0.cast("decimal(34,0)")
    ).cast("decimal(38,0)")


def fixed_units_total(u: Column | str) -> Column:
    """Public alias of ``_limb_total`` for callers that PERSIST the exact
    aggregate as mergeable state (incremental view maintenance): a
    DECIMAL(38,0) unit total is exact, order-independent, and merges
    across batches by plain addition — unlike a rounded double, whose
    merged partials drift off the full recompute at 4-decimal
    midpoints."""
    return _limb_total(u)


def fixed_sum_dec(c: Column, dp: int) -> Column:
    """Exact decimal total on the long fast path — the
    ``sum(cast(c as DEC))`` replacement for callers that keep the
    decimal value for downstream ordering / lag arithmetic. Decimal
    division keeps >= 6 fractional digits (Spark's result-scale rule
    with a decimal(7,0) divisor -> decimal(38,6)): exact for dp <= 6."""
    assert 0 <= dp <= 6, "division-scale exactness holds for dp <= 6 only"
    if isinstance(c, str):
        return F.expr(_s_fixed_sum_dec(f"({c})", dp))
    return _limb_total(fixed_units(c, dp)) / F.lit(10**dp).cast("decimal(7,0)")


def fixed_sum_raw(c: Column, dp: int) -> Column:
    """``stable_sum_raw`` on the long fast path: exact,
    order-independent sum of a double column with true decimal scale
    <= ``dp`` (see ``fixed_units`` for the domain contract), returned as
    the identical un-rounded double the decimal path yields — the ONE
    correctly-rounded decimal->double cast is the same rounding sequence
    as the decimal path, so results are bit-equal. A single drop-in
    aggregate expression (it composes three ``F.sum``s arithmetically,
    so it is usable anywhere ``stable_sum_raw`` is)."""
    if isinstance(c, str):
        return F.expr(f"CAST({_s_fixed_sum_dec(f'({c})', dp)} AS DOUBLE)")
    return fixed_sum_dec(c, dp).cast("double")


def fixed_sum(c: Column | str, dp: int) -> Column:
    """``stable_sum`` on the long fast path (see ``fixed_sum_raw``)."""
    if isinstance(c, str):
        x = f"CAST({_s_fixed_sum_dec(f'({c})', dp)} AS DOUBLE)"
        return F.expr(_s_round_dp(x, ROUND))
    return round_dp(fixed_sum_raw(c, dp))


def fixed_avg(c: Column | str, dp: int) -> Column:
    """``stable_avg`` on the long fast path (see ``fixed_sum_raw``)."""
    if isinstance(c, str):
        s = f"({c})"
        x = f"(CAST({_s_fixed_sum_dec(s, dp)} AS DOUBLE) / count({s}))"
        return F.expr(_s_round_dp(x, ROUND))
    return round_dp(fixed_sum_raw(c, dp) / F.count(c))


def fixed_sum_units_raw(u: Column | str, dp: int) -> Column:
    """``fixed_sum_raw`` over an already-built long units column (for
    callers that derive units once and reuse them across aggregates,
    e.g. exact products ``fixed_units(x,2) * fixed_units(y,2)`` summed
    at ``dp=4``)."""
    if isinstance(u, str):
        return F.expr(
            f"CAST(({_s_limb_total(f'({u})')}"
            f" / CAST({10**dp} AS DECIMAL(7,0))) AS DOUBLE)"
        )
    return (_limb_total(u) / F.lit(10**dp).cast("decimal(7,0)")).cast("double")


# --- DuckDB SQL twins ------------------------------------------------------


def sql_stable_sum(expr: str) -> str:
    return sql_round_dp(f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)")


def sql_stable_sum_raw(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def sql_stable_avg(expr: str) -> str:
    return sql_round_dp(
        f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"
        f" / count({expr})"
    )


# ---------------------------------------------------------------------------
# Exact interpolated quantiles, sort-based.
#
# Spark's exact ``percentile`` aggregate is an ImperativeAggregate over a
# per-group value map (ObjectHashAggregate, no codegen) — measured ~4.5x
# slower than collecting the group into one array and sorting it
# (600k rows / 3 groups: 1.35 s vs 0.30 s at sf0.1). Both hold the whole
# group's values (exact quantiles inherently do — the SCALE path is the
# GK / KLL sketch beside them); the array form just reaches the same
# buffer through codegen'd collect_list + a single JVM array sort.
#
# ``quantile_interp`` reproduces DuckDB's quantile_cont BIT-EXACTLY —
# the oracle the driver hashes raw values against: pos = p * (n - 1);
# return the element when pos is integral, else the weighted form
#   (ceil(pos) - pos) * lower + (pos - floor(pos)) * upper.
# DuckDB evaluates exactly this double expression (verified on corpus
# data AND on adversarial inputs: equal subnormals interpolate to 0.0,
# equal 0.1s drift one ulp at fractional positions — fuzz-pinned in
# tests/test_fixed_point_parity.py). Two near-misses this replaces or
# avoids: the delta form lower + frac * (upper - lower) differs from
# the oracle in the last ulp on ordinary data, and Spark's own
# Percentile aggregate short-circuits equal adjacent values to the
# retained value where DuckDB still interpolates — so F.percentile is
# itself a latent oracle mismatch on duplicate-heavy columns.
# ---------------------------------------------------------------------------


# Domain contract (like ``fixed_units``'): sorted_vals buffers a WHOLE
# GROUP in one aggregation state — it exists so exact-quantile twins can
# gate the mergeable sketches (KLL/GK) against the DuckDB oracle, and it
# is ORACLE SCAFFOLDING with a bench-scale domain, not a production
# aggregate. At 100 TB the sketch column ships and the exact twin is
# dropped (see queries/profiling.py docstrings). The runtime guard below
# raises mid-query if any group exceeds the domain, so a future caller
# cannot silently ship a full-corpus collect_list into a hot path.
SORTED_VALS_MAX = 5_000_000  # ~40 MB of doubles per group buffer


def sorted_vals(c: Column) -> Column:
    """Aggregate: the group's values as one ascending-sorted array
    (nulls dropped by collect_list, matching percentile/quantile_cont).

    Raises at execution time when a group holds more than
    ``SORTED_VALS_MAX`` values — see the domain contract above."""
    arr = F.sort_array(F.collect_list(c))
    # the raise sits in the OTHERWISE branch (not an if(x,a,a) shape a
    # conditional-simplification rule could fold away), so the size
    # check survives optimization and fires at execution time
    return F.when(F.size(arr) <= F.lit(SORTED_VALS_MAX), arr).otherwise(
        F.raise_error(
            F.lit(
                "sorted_vals: group exceeds SORTED_VALS_MAX "
                f"({SORTED_VALS_MAX}) — this exact-quantile twin is "
                "oracle scaffolding with a bench-scale domain; use the "
                "KLL/GK sketch path at scale"
            )
        )
    )


def quantile_interp(sorted_col: Column, p: float) -> Column:
    """Exact interpolated p-quantile from a ``sorted_vals`` array."""
    n = F.size(sorted_col)
    pos = F.lit(float(p)) * (n - F.lit(1)).cast("double")
    lo = F.floor(pos)
    hi = F.ceil(pos)
    base = F.element_at(sorted_col, lo.cast("int") + F.lit(1))
    upper = F.element_at(sorted_col, hi.cast("int") + F.lit(1))
    interp = (hi.cast("double") - pos) * base + (
        pos - lo.cast("double")
    ) * upper
    return F.when(n > 0, F.when(hi == lo, base).otherwise(interp))
