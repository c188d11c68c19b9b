"""Similarity-search queries hash-match their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import vectors

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(vectors.QUERIES))
def test_vector_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, vectors.QUERIES[name], vectors.ORACLES[name], name)


def test_ann_results_subset_of_bruteforce_corpus(spark):
    """Every ANN hit is a real corpus vector with the exact cosine the
    brute-force path computes; measure recall@k for visibility."""
    bf = vectors.QUERIES["embedding_topk_bruteforce"](spark, SF_SMOKE).collect()
    ann = vectors.QUERIES["embedding_ann_lsh"](spark, SF_SMOKE).collect()
    bf_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in bf}
    hits = sum(1 for r in ann if (r["query_id"], r["neighbor_id"]) in bf_cos)
    # same-bucket neighbors that also rank top-k globally must carry the
    # identical cosine value (bit-exact shared arithmetic)
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf_cos:
            assert r["cosine"] == bf_cos[key]
    recall = hits / len(bf)
    assert recall > 0.1  # sanity floor: one 8-bit bucket probe, tiny corpus
