"""Prefix filtering is lossless: the AllPairs-pruned Jaccard join returns
exactly the exhaustive result (doc-frequency cap disabled to isolate the
prefix property)."""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.dedup import (
    jaccard_pairs,
)
from datafoundation_multi_source_retail_data_integration_hub_spark.sources.tables import (
    load_table,
)

from .conftest import SF_SMOKE


def _result_set(df):
    return {(r["id1"], r["id2"], f'{r["jaccard"]:.12g}') for r in df.collect()}


def test_prefix_filter_lossless(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    kwargs = dict(n=3, threshold=0.2, max_doc_freq=10**9)
    exact = _result_set(jaccard_pairs(docs, "text", "doc_id", **kwargs))
    pruned = _result_set(
        jaccard_pairs(docs, "text", "doc_id", prefix_filter=True, **kwargs)
    )
    assert exact == pruned
    assert len(exact) > 0


def test_prefix_filter_lossless_high_threshold(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    kwargs = dict(n=2, threshold=0.6, max_doc_freq=10**9)
    exact = _result_set(jaccard_pairs(docs, "text", "doc_id", **kwargs))
    pruned = _result_set(
        jaccard_pairs(docs, "text", "doc_id", prefix_filter=True, **kwargs)
    )
    assert exact == pruned
