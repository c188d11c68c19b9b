"""Extended relational queries (semi/anti joins, supplier star, top-1-per-
group) hash-match their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import (
    relational_ext,
)

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(relational_ext.QUERIES))
def test_relational_ext_query_matches_oracle(spark, name):
    compare(
        spark,
        SF_SMOKE,
        relational_ext.QUERIES[name],
        relational_ext.ORACLES[name],
        name,
    )
