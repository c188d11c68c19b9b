"""Event/window/sessionization/streaming queries match their oracles."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import eventops
from datafoundation_multi_source_retail_data_integration_hub_spark.streaming import pipelines

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(eventops.QUERIES))
def test_eventops_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, eventops.QUERIES[name], eventops.ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(pipelines.QUERIES))
def test_streaming_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, pipelines.QUERIES[name], pipelines.ORACLES[name], name)


def test_streaming_session_windows_run(spark):
    """Native session_window streaming path executes and produces rows."""
    out = pipelines.run_to_memory(
        pipelines.session_windows(pipelines.events_stream(spark, SF_SMOKE))
    )
    assert out.count() > 0
