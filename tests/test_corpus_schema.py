"""Corpus-schema drift guard.

The driver regenerates /root/testdata between rounds; round 2 lost six
queries and the whole bench to a silent physical-encoding change
(events.ts became TIMESTAMP_NTZ). This test pins the *loaded* Spark
schema of every corpus table — `sources.tables.load_table` must present
the same logical schema regardless of how the parquet files are encoded
— so the next regeneration fails here in seconds instead of wiping a
driver round.
"""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.sources.tables import (
    TPCH_TABLES,
    load_table,
)

from .conftest import SF_SMOKE

# table -> {col: spark simpleString type}. Event-time columns must load as
# plain TIMESTAMP (session-TZ) — NTZ/nanos encodings are normalized by the
# loader; anything else breaks withWatermark/unix_micros downstream.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # MUST be TZ-aware after load_table normalization
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TPCH_TABLES)
def test_loaded_schema_matches_pin(spark, table):
    df = load_table(spark, SF_SMOKE, table)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert got == EXPECTED[table], (
        f"corpus schema drift in {table!r}: loader presented {got}, "
        f"pinned {EXPECTED[table]} — fix sources/tables.py normalization "
        "before anything downstream runs"
    )


def test_orderdate_timestamps_not_ntz(spark):
    # o_orderdate / l_shipdate arrive via the plain reader too; if a future
    # corpus drops their UTC flag these also become NTZ and date arithmetic
    # vs the DuckDB oracle drifts. Assert explicitly for a sharper message.
    for table, col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        dt = load_table(spark, SF_SMOKE, table).schema[col].dataType.simpleString()
        assert dt == "timestamp", f"{table}.{col} loaded as {dt}, want timestamp"
