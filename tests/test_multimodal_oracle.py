"""Multimodal binary-stat queries hash-match their DuckDB oracles."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import multimodalops

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(multimodalops.QUERIES))
def test_multimodal_query_matches_oracle(spark, name):
    compare(
        spark, SF_SMOKE, multimodalops.QUERIES[name], multimodalops.ORACLES[name], name
    )
