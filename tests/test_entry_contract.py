"""Driver-contract invariants over __spark_entry__: module QUERIES dicts
must not shadow each other (a duplicate name would silently drop a query
from the driver's correctness run), every oracle key must have a query,
and the SQL strings must at least parse in DuckDB against empty views.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry


def test_query_names_unique_across_modules():
    seen: dict[str, str] = {}
    for m in entry._modules():
        for name in m.QUERIES:
            assert name not in seen, (
                f"query {name!r} defined in both {seen[name]} and {m.__name__}"
            )
            seen[name] = m.__name__


def test_every_oracle_has_a_query():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = set(osql) - set(qs)
    assert not missing, f"oracle entries without a query: {sorted(missing)}"


@pytest.fixture(scope="module")
def empty_con():
    con = duckdb.connect()
    schemas = {
        "region": "r_regionkey INT, r_name VARCHAR",
        "nation": "n_nationkey INT, n_name VARCHAR, n_regionkey INT",
        "customer": (
            "c_custkey BIGINT, c_name VARCHAR, c_nationkey INT, "
            "c_acctbal DOUBLE, c_mktsegment VARCHAR"
        ),
        "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT, s_acctbal DOUBLE",
        "part": (
            "p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, p_type VARCHAR, "
            "p_size INT, p_retailprice DOUBLE"
        ),
        "orders": (
            "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
            "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR"
        ),
        "lineitem": (
            "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
            "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
            "l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, "
            "l_linestatus VARCHAR, l_shipdate TIMESTAMP"
        ),
        "events": (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, "
            "value DOUBLE, props VARCHAR"
        ),
        "documents": (
            "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, "
            "n_chars BIGINT"
        ),
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
    }
    for name, cols in schemas.items():
        con.execute(f"CREATE TABLE {name} ({cols})")
    return con


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_oracle_sql_parses_and_runs_on_empty_tables(empty_con, name):
    """Every oracle must be syntactically valid and schema-compatible —
    a typo'd oracle otherwise only surfaces inside the driver's budgeted
    run. Empty tables make this a millisecond check."""
    empty_con.execute(entry.oracle_sql()[name]).fetchall()


def test_all_query_outputs_canonicalizable(spark):
    """The driver's correctness canonicalizer sorts every output column
    in pandas; an array/map/struct column raises `TypeError: unhashable
    type` there and the query records a red row WITHOUT ever being
    value-compared (exactly what buried embedding_quantize_int8 in one
    round). Pin flat output schemas for every declared query. Schema
    resolution is lazy — no query executes."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    sf = "/root/testdata/sf0.001"
    nested = []
    for name, fn in entry.queries().items():
        schema = fn(spark, sf).schema
        cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if cols:
            nested.append((name, cols))
    assert not nested, f"non-canonicalizable output columns: {nested}"
