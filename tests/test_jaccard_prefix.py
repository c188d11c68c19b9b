"""Prefix filtering is lossless: the AllPairs-pruned Jaccard join returns
exactly the exhaustive result — both with the doc-frequency cap disabled
(isolating the prefix property) and with a cap tight enough to bite (the
df cap is computed on the FULL postings before pruning, so capped
semantics are preserved too)."""

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


def test_prefix_filter_lossless_with_biting_df_cap(spark):
    """A cap small enough to drop real shingles must still yield identical
    results in both modes (capped-inter / full-size Jaccard semantics)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    kwargs = dict(n=3, threshold=0.2, max_doc_freq=5)
    exact = _result_set(jaccard_pairs(docs, "text", "doc_id", **kwargs))
    pruned = _result_set(
        jaccard_pairs(docs, "text", "doc_id", prefix_filter=True, **kwargs)
    )
    assert exact == pruned
    assert len(exact) > 0
