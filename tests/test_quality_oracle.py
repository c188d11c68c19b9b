"""Validation/percentile queries hash-match their DuckDB oracles."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import quality

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(quality.QUERIES))
def test_quality_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, quality.QUERIES[name], quality.ORACLES[name], name)
