"""Warehouse-build queries hash-match their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import warehouse

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(warehouse.QUERIES))
def test_warehouse_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, warehouse.QUERIES[name], warehouse.ORACLES[name], name)
