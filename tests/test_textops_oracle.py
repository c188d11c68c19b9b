"""Text-analysis/dedup queries hash-match their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import textops

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(textops.QUERIES))
def test_textops_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, textops.QUERIES[name], textops.ORACLES[name], name)


def test_pair_queries_nonempty(spark):
    """The near-dup family must actually find pairs on the corpus (a 0-row
    match would be a vacuous correctness check)."""
    for name in (
        "doc_ngram_jaccard_pairs",
        "doc_minhash_lsh_pairs",
        "doc_simhash_pairs",
    ):
        assert textops.QUERIES[name](spark, SF_SMOKE).count() > 0, name


def test_minhash_recall_vs_exact(spark):
    """LSH candidates verified by exact Jaccard: result must be a subset of
    the exhaustive n-gram Jaccard pairs, with high recall on this corpus."""
    exact = {
        (r["id1"], r["id2"])
        for r in textops.QUERIES["doc_ngram_jaccard_pairs"](spark, SF_SMOKE).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in textops.QUERIES["doc_minhash_lsh_pairs"](spark, SF_SMOKE).collect()
    }
    assert lsh <= exact
    assert len(lsh) >= 0.8 * len(exact)
