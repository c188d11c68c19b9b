"""Pareto 80%-tier boundary semantics (queries/relational.supplier_pareto).

The tier test is (cum - rev) * 5 < tot * 4 in exact decimal — a supplier
whose PRECEDING cumulative share is exactly 80% must be excluded (strict
inequality), with no float comparison anywhere near the cut.
"""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.queries.relational import (
    supplier_pareto,
)


def _write_lineitem(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "l_suppkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    return str(tmp_path)


def test_exact_80_percent_boundary_is_excluded(spark, tmp_path):
    # revenues 80 / 20: supplier 2's preceding cumulative share is exactly
    # 0.8 -> (cum - rev)*5 == tot*4 -> strict < excludes it
    sf = _write_lineitem(
        spark, tmp_path, [(1, 80.0, 0.0), (2, 20.0, 0.0)]
    )
    got = {r["s_suppkey"]: r for r in supplier_pareto(spark, sf).collect()}
    assert got[1]["in_top80"] is True
    assert got[2]["in_top80"] is False
    assert got[1]["pareto_rank"] == 1 and got[2]["pareto_rank"] == 2
    assert got[2]["cum_share"] == 1.0


def test_just_under_the_boundary_is_included(spark, tmp_path):
    # revenues 79.99 / 20.01: preceding share 0.7999 < 0.8 -> included
    sf = _write_lineitem(
        spark, tmp_path, [(1, 79.99, 0.0), (2, 20.01, 0.0)]
    )
    got = {r["s_suppkey"]: r for r in supplier_pareto(spark, sf).collect()}
    assert got[2]["in_top80"] is True


def test_revenue_ties_rank_by_supplier_key(spark, tmp_path):
    sf = _write_lineitem(
        spark, tmp_path, [(7, 50.0, 0.0), (3, 50.0, 0.0)]
    )
    got = {r["s_suppkey"]: r["pareto_rank"] for r in supplier_pareto(spark, sf).collect()}
    assert got == {3: 1, 7: 2}
