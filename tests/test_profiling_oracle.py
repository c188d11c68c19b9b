"""Profiling queries (exact deciles, grouping sets, moment statistics)
match their DuckDB oracles, plus semantic invariants."""

from __future__ import annotations

import math

import duckdb
import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import profiling

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(profiling.QUERIES))
def test_profiling_query_matches_oracle(spark, name):
    compare(
        spark, SF_SMOKE, profiling.QUERIES[name], profiling.ORACLES[name], name
    )


def test_deciles_are_balanced_and_ordered(spark):
    rows = {
        r["decile"]: r
        for r in profiling.customer_revenue_deciles(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(range(10))
    sizes = [rows[d]["n_customers"] for d in range(10)]
    assert max(sizes) - min(sizes) <= 1  # rank formula balances within 1
    # decile 0 holds the top spenders: min revenue of decile d >= max of d+1
    for d in range(9):
        assert rows[d]["min_revenue"] >= rows[d + 1]["max_revenue"]


def test_grouping_sets_levels_consistent(spark):
    out = profiling.order_grouping_sets(spark, SF_SMOKE).collect()
    detail = [r for r in out if r["g_flag"] == 0 and r["g_status"] == 0]
    per_flag = [r for r in out if r["g_flag"] == 0 and r["g_status"] == 1]
    grand = [r for r in out if r["g_flag"] == 1 and r["g_status"] == 1]
    assert len(grand) == 1
    assert grand[0]["n_items"] == sum(r["n_items"] for r in detail)
    assert grand[0]["n_items"] == sum(r["n_items"] for r in per_flag)


def test_stats_profile_matches_native_aggregates(spark):
    """The decimal-moment construction reproduces DuckDB's native
    stddev_samp/corr to float tolerance (they use different summation
    orders, so exact equality is not expected — the oracle comparison
    covers exactness of OUR construction)."""
    got = profiling.lineitem_stats_profile(spark, SF_SMOKE).collect()[0]
    con = duckdb.connect()
    ref = con.execute(
        f"SELECT avg(l_quantity), stddev_samp(l_quantity), "
        f"corr(l_quantity, l_extendedprice) "
        f"FROM '{SF_SMOKE}/lineitem.parquet'"
    ).fetchone()
    assert math.isclose(got["mean_qty"], ref[0], rel_tol=1e-4)
    assert math.isclose(got["stddev_qty"], ref[1], rel_tol=1e-4)
    assert math.isclose(got["corr_qty_price"], ref[2], rel_tol=1e-3, abs_tol=1e-4)


def test_sketch_bounds_hold_at_bench_scale(spark):
    """The sketch queries' contract is the error bound (the oracle checks
    the booleans at sf0.001/sf0.01); verify the bound also holds at the
    bench scale, where group cardinalities are 100x larger and HLL++
    register saturation would first show."""
    from datafoundation_multi_source_retail_data_integration_hub_spark.queries import (
        profiling as P,
    )

    sf = "/root/testdata/sf0.1"
    hll = P.orders_approx_distinct_sketch(spark, sf).collect()
    assert hll and all(r["hll_within_bound"] for r in hll)
    qs = P.lineitem_quantile_sketch(spark, sf).collect()
    assert qs and all(r["p50_sketch_ok"] and r["p95_sketch_ok"] for r in qs)


def test_sketch_rollup_merge_equals_direct_sketch(spark):
    """Mergeability invariant behind events_sketch_rollup's ALL row: the
    union of per-type HLL sketches estimates the SAME cardinality as one
    sketch built directly over the corpus (DataSketches HLL union is
    lossless at equal lgK), and the merged KLL quantile lands within the
    documented bound of the direct sketch's."""
    from pyspark.sql import functions as F

    from datafoundation_multi_source_retail_data_integration_hub_spark.sources.tables import (
        load_tables,
    )

    ev = load_tables(spark, SF_SMOKE, "events")["events"]
    merged = (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_agg("user_id", profiling.HLL_LG_K).alias("h"),
            F.kll_sketch_agg_double("value", profiling.KLL_K).alias("k"),
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("h", F.lit(True))
            ).alias("users"),
            F.kll_sketch_get_quantile_double(
                F.kll_merge_agg_double("k"), F.lit(0.5)
            ).alias("p50"),
        )
        .collect()[0]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", profiling.HLL_LG_K)
        ).alias("users"),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("value", profiling.KLL_K), F.lit(0.5)
        ).alias("p50"),
    ).collect()[0]
    assert merged["users"] == direct["users"]
    # the merged KLL holds 5x200 values > k=800, so it compacts (a
    # RANDOMIZED process — no exact equality); assert both sketch
    # medians land inside a generous exact rank envelope instead
    lo, hi = (
        ev.agg(
            F.percentile("value", 0.4).alias("lo"),
            F.percentile("value", 0.6).alias("hi"),
        ).collect()[0]
    )
    for v in (merged["p50"], direct["p50"]):
        assert lo <= v <= hi, (v, lo, hi)


def test_theta_set_algebra_is_consistent(spark):
    """|A∩B| + |A\\B| must equal |A| when the theta sketches are in exact
    mode (corpus user cardinality is far below the 4096 nominal
    entries), and every bound boolean must hold."""
    row = profiling.events_user_overlap_theta(spark, SF_SMOKE).collect()[0]
    assert row["both_users"] + row["purchase_only_users"] == row["purchase_users"]
    assert row["either_users"] == (
        row["purchase_users"] + row["click_users"] - row["both_users"]
    )
    for c in ("a_ok", "b_ok", "intersect_ok", "union_ok", "difference_ok"):
        assert row[c] is True
