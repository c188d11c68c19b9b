"""fixed_sum (long limb fast path) must be bit-identical to stable_sum
(decimal path) — the whole point is a drop-in swap on hot aggregations
without moving the oracle-parity goalposts.

Adversarial surface: 4-decimal rounding midpoints (the exact case the
decimal path exists for), negative units (mixed-sign limb sums), NULLs,
grouped aggregation, and hypothesis-fuzzed 2-decimal money values.
"""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
    fixed_avg,
    fixed_sum,
    fixed_sum_raw,
    fixed_units,
    fixed_sum_units_raw,
    stable_avg,
    stable_sum,
    stable_sum_raw,
)


def _both(spark, values, dp):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    row = df.agg(
        stable_sum(F.col("x")).alias("dec_sum"),
        fixed_sum(F.col("x"), dp).alias("fix_sum"),
        stable_sum_raw(F.col("x")).alias("dec_raw"),
        fixed_sum_raw(F.col("x"), dp).alias("fix_raw"),
        stable_avg(F.col("x")).alias("dec_avg"),
        fixed_avg(F.col("x"), dp).alias("fix_avg"),
    ).first()
    return row


def _assert_equal(row):
    for a, b in (("dec_sum", "fix_sum"), ("dec_raw", "fix_raw"), ("dec_avg", "fix_avg")):
        x, y = row[a], row[b]
        if x is None or y is None:
            assert x is y, (a, x, y)
        else:
            # bit-identical doubles, not approx
            assert math.isnan(x) and math.isnan(y) or x == y, (a, x, y)


def test_rounding_midpoint_exact(spark):
    # sums land exactly on a 4-decimal HALF_UP midpoint: 0.00005,
    # 12.33335, and a negative midpoint — the decimal path's raison
    # d'etre. Built from 2-decimal-ish addends.
    cases = [
        [0.00005],
        [0.0001, -0.00005],
        [12.3333, 0.00005],
        [-12.3333, -0.00005],
        [1e9, 0.00005, -1e9],  # midpoint after cancellation of big units
    ]
    for vals in cases:
        _assert_equal(_both(spark, vals, dp=6))


def test_mixed_sign_and_null(spark):
    vals = [123.45, -999.99, 0.0, -0.01, 777777.77, None, -123456.78]
    _assert_equal(_both(spark, vals, dp=2))
    # all-NULL group: both paths yield NULL sums
    row = _both(spark, [None, None], dp=2)
    assert row["dec_raw"] is None and row["fix_raw"] is None


def test_grouped_matches_decimal_path(spark):
    random.seed(7)
    rows = [
        (i % 13, round(random.uniform(-1e5, 1e5), 2)) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "k int, x double")
    got = (
        df.groupBy("k")
        .agg(
            stable_sum(F.col("x")).alias("dec"),
            fixed_sum(F.col("x"), 2).alias("fix"),
            stable_sum_raw(F.col("x")).alias("dec_raw"),
            fixed_sum_raw(F.col("x"), 2).alias("fix_raw"),
        )
        .collect()
    )
    assert len(got) == 13
    for r in got:
        assert r["dec"] == r["fix"] and r["dec_raw"] == r["fix_raw"], r


def test_units_products_sum_exact(spark):
    # the DEC_SQ replacement shape: sum(x*y) where x,y are 2-decimal
    # money — exact as long unit products at dp=4
    random.seed(11)
    rows = [
        (round(random.uniform(0, 1e5), 2), round(random.uniform(0, 50), 0))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "p double, q double")
    up = fixed_units(F.col("p"), 2) * fixed_units(F.col("q"), 2)
    row = df.agg(
        F.sum((F.col("p") * F.col("q")).cast("decimal(38,6)"))
        .cast("double")
        .alias("dec"),
        fixed_sum_units_raw(up, 4).alias("fix"),
    ).first()
    assert row["dec"] == row["fix"]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=-9_999_999, max_value=9_999_999, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=60,
    )
)
def test_fuzz_money_sums(spark, xs):
    vals = [float(x) for x in xs]
    _assert_equal(_both(spark, vals, dp=2))


# ---------------------------------------------------------------------------
# quantile_interp (sort-based exact quantiles) must be bit-identical to
# DuckDB's quantile_cont — that is the ORACLE the driver hashes raw
# values against. The reference is deliberately NOT Spark's Percentile:
# on equal adjacent sorted values at a fractional position, Percentile
# short-circuits to the retained value while DuckDB (and
# quantile_interp) always evaluate the weighted form
# (1-f)*lower + f*upper — which can differ in the last ulp (and rounds
# [5e-324, 5e-324] @ p=0.5 to 0.0, verified against DuckDB directly).
# Pinning to Percentile would therefore pin to the WRONG engine exactly
# where the two diverge.
# ---------------------------------------------------------------------------


def _quantiles_both(spark, values, ps):
    import duckdb

    from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
        quantile_interp,
        sorted_vals,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in values])
    ref = [
        con.execute(f"SELECT quantile_cont(x, {p!r}) FROM t").fetchone()[0]
        for p in ps
    ]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got_row = df.agg(sorted_vals(F.col("x")).alias("__v")).select(
        *[
            quantile_interp(F.col("__v"), p).alias(f"q{i}")
            for i, p in enumerate(ps)
        ]
    ).first()
    return ref, [got_row[f"q{i}"] for i in range(len(ps))]


def test_quantile_interp_bit_equals_quantile_cont(spark):
    ps = [0.0, 0.5, 0.9, 0.95, 0.99, 1.0]
    random.seed(7)
    values = [round(random.uniform(900.0, 600000.0), 2) for _ in range(4999)]
    ref, got = _quantiles_both(spark, values, ps)
    for p, a, b in zip(ps, ref, got):
        assert a == b and math.copysign(1, a) == math.copysign(1, b), (p, a, b)


def test_quantile_interp_equal_adjacent_values_match_duckdb(spark):
    # the cases where Spark's Percentile and DuckDB diverge — the engine
    # must side with the oracle: interpolation between equal subnormals
    # rounds to zero, equal 0.1s at a fractional position drift one ulp
    ref, got = _quantiles_both(spark, [5e-324, 5e-324], [0.3, 0.5, 0.9])
    assert ref == got == [5e-324, 0.0, 5e-324]
    ref, got = _quantiles_both(spark, [0.1, 0.1], [0.3, 0.5])
    assert ref == got == [0.09999999999999999, 0.1]


def test_quantile_interp_integral_positions(spark):
    # n chosen so p*(n-1) lands exactly on integers for every p — the
    # branch that must return the element, not 0*lo + 0*hi
    ps = [0.0, 0.25, 0.5, 0.75, 1.0]
    values = [float(i) for i in range(101)]
    ref, got = _quantiles_both(spark, values, ps)
    assert ref == got == [0.0, 25.0, 50.0, 75.0, 100.0]


def test_quantile_interp_single_value_group(spark):
    ref, got = _quantiles_both(spark, [42.5], [0.0, 0.5, 1.0])
    assert ref == got == [42.5, 42.5, 42.5]


@given(
    xs=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=20, deadline=None)
def test_fuzz_quantile_interp(spark, xs):
    ref, got = _quantiles_both(spark, xs, [0.1, 0.5, 0.9])
    assert ref == got, (xs, ref, got)


def test_round_dp_matches_duckdb_where_builtin_round_does_not(spark):
    """951.27/24 prints as "39.63625" but its exact binary value is just
    below the midpoint: Spark's builtin round says 39.6363 (it rounds
    the shortest decimal repr), DuckDB's says 39.6362 (it rounds the
    binary value). round_dp / sql_round_dp must agree with each other —
    and expose that the builtins disagree, so the trap stays visible."""
    import duckdb

    from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
        round_dp,
        sql_round_dp,
    )

    x = "CAST(951.27 AS DOUBLE) / 24"
    row = spark.range(1).select(
        round_dp(F.expr(x)).alias("ours"),
        F.round(F.expr(x), 4).alias("builtin"),
    ).first()
    duck_ours, duck_builtin = duckdb.sql(
        f"SELECT {sql_round_dp(x)}, round({x}, 4)"
    ).fetchone()
    assert row["ours"] == duck_ours == 39.6362
    assert row["builtin"] == 39.6363 and duck_builtin == 39.6362  # the trap


def test_round_dp_full_double_domain(spark):
    """Beyond |x|*10^dp >= 2^63 Spark's bigint-typed floor would
    overflow while DuckDB's floor stays a double — round_dp branches on
    the 2^52 all-integers bound so the two engines stay bit-identical
    over the WHOLE double range (the ADVICE-r05 domain edge)."""
    import struct

    import duckdb

    from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
        round_dp,
        sql_round_dp,
    )

    edges = [
        "CAST(9.3e14 AS DOUBLE)",          # |x|*1e4 just past 2^63
        "CAST(-9.3e14 AS DOUBLE)",
        "CAST(4.6e14 AS DOUBLE) + 0.37",   # just under 2^63, inside long
        "CAST(4.503599627370497e11 AS DOUBLE)",  # y straddles 2^52
        "CAST(1e308 AS DOUBLE)",           # far past any long
        "CAST(-1e308 AS DOUBLE)",
        "CAST(123.456789 AS DOUBLE)",      # ordinary in-domain value
    ]
    sels = [round_dp(F.expr(x)).alias(f"c{i}") for i, x in enumerate(edges)]
    srow = spark.range(1).select(*sels).first()
    drow = duckdb.sql(
        "SELECT " + ", ".join(sql_round_dp(x) for x in edges)
    ).fetchone()
    for i, (s, d) in enumerate(zip(srow, drow)):
        assert struct.pack("<d", s) == struct.pack("<d", d), (edges[i], s, d)


def test_sorted_vals_guard_fires_on_oversized_group(spark, monkeypatch):
    """sorted_vals is oracle scaffolding with a bench-scale domain; the
    runtime guard must raise mid-query on a group past SORTED_VALS_MAX
    (shrunk here), and stay invisible inside the domain."""
    import pytest

    from datafoundation_multi_source_retail_data_integration_hub_spark.functions import (
        parity,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("x"))
    monkeypatch.setattr(parity, "SORTED_VALS_MAX", 10)
    with pytest.raises(Exception, match="SORTED_VALS_MAX"):
        df.agg(parity.sorted_vals(F.col("x")).alias("v")).collect()
    monkeypatch.setattr(parity, "SORTED_VALS_MAX", 100)
    got = df.agg(
        parity.quantile_interp(parity.sorted_vals(F.col("x")), 0.5).alias("p50")
    ).first()["p50"]
    assert got == 49.5


def test_fixed_units_total_merges_across_batches(spark):
    """The IVM invariant behind mart_incremental_refresh: the DECIMAL
    unit total of a whole dataset equals the plain sum of per-batch
    totals (exact, order-independent), and presenting (divide + round)
    the merged state is bit-identical to presenting a one-shot total.
    Rounded-double partials do NOT have this property at 4-decimal
    midpoints — which is why the stored state is units, not doubles."""
    import random

    from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
        fixed_units,
        fixed_units_total,
        round_dp,
    )

    random.seed(13)
    vals = [0.00005, -0.00005, 12.3333, -12.33335] + [
        round(random.uniform(-1e5, 1e5), 4) for _ in range(500)
    ]
    mid = len(vals) // 3

    def units_total(values):
        df = spark.createDataFrame([(v,) for v in values], "x double")
        return df.agg(
            fixed_units_total(fixed_units(F.col("x"), 4)).alias("u")
        ).first()["u"]

    whole = units_total(vals)
    merged = units_total(vals[:mid]) + units_total(vals[mid:])
    assert merged == whole

    def present(units):
        df = spark.createDataFrame([(units,)], "u decimal(38,0)")
        return df.select(
            round_dp(
                (F.col("u") / F.lit(10**4).cast("decimal(7,0)")).cast("double")
            ).alias("r")
        ).first()["r"]

    assert present(merged) == present(whole)


def test_expr_string_path_bit_equals_column_path(spark):
    """The single-``F.expr`` string fast path (driver-time optimization:
    one py4j round-trip per aggregate instead of ~50) must be
    bit-identical to the Column-chain path for every helper, including
    NaN/overflow edges of ``round_dp`` — both paths must parse/compose
    to the same Catalyst arithmetic."""
    import struct

    from datafoundation_multi_source_retail_data_integration_hub_spark.functions.parity import (
        fixed_sum_dec,
        fixed_units_total,
        round_dp,
    )

    vals = [1.01, 2.5, -3.07, 951.27 / 24, 0.0005, -0.0005, 1e9 + 0.125]
    df = spark.createDataFrame([(v,) for v in vals], "x double")

    def bits(v):
        return None if v is None else struct.pack("<d", float(v)).hex()

    col_row = df.agg(
        fixed_sum(F.col("x"), 4).alias("a"),
        fixed_avg(F.col("x"), 4).alias("b"),
        fixed_sum_raw(F.col("x"), 4).alias("c"),
        fixed_sum_dec(F.col("x"), 4).alias("d"),
        stable_sum(F.col("x")).alias("e"),
        stable_avg(F.col("x")).alias("f"),
        stable_sum_raw(F.col("x")).alias("g"),
        fixed_units_total(fixed_units(F.col("x"), 4)).alias("h"),
    ).first()
    str_row = df.agg(
        fixed_sum("x", 4).alias("a"),
        fixed_avg("x", 4).alias("b"),
        fixed_sum_raw("x", 4).alias("c"),
        fixed_sum_dec("x", 4).alias("d"),
        stable_sum("x").alias("e"),
        stable_avg("x").alias("f"),
        stable_sum_raw("x").alias("g"),
        fixed_units_total(fixed_units("x", 4)).alias("h"),
    ).first()
    for k in "abcdefg":
        assert bits(col_row[k]) == bits(str_row[k]), (
            k,
            col_row[k],
            str_row[k],
        )
    assert col_row["h"] == str_row["h"]

    # round_dp edges: NaN passthrough, >=2^52 identity, negative midpoint
    edge = spark.createDataFrame(
        [(float("nan"),), (float(2**60),), (-0.00005,), (39.636249999999,)],
        "x double",
    )
    col_r = [bits(r[0]) for r in edge.select(round_dp(F.col("x"), 4)).collect()]
    str_r = [bits(r[0]) for r in edge.select(round_dp("x", 4)).collect()]
    assert col_r == str_r
