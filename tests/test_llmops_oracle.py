"""Training-data pipeline queries (sampling, splits, vocab, TF-IDF,
packing, decontamination) match their DuckDB oracles, plus semantic
invariants the oracles can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.queries import llmops

from .conftest import SF_SMOKE
from .oracle import compare


@pytest.mark.parametrize("name", sorted(llmops.QUERIES))
def test_llmops_query_matches_oracle(spark, name):
    compare(spark, SF_SMOKE, llmops.QUERIES[name], llmops.ORACLES[name], name)


def test_train_split_partitions_disjoint_and_stable(spark):
    out = llmops.doc_train_split(spark, SF_SMOKE)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == out.count()  # every doc exactly one split
    # deterministic: a second evaluation assigns identical splits
    again = {r["doc_id"]: r["split"] for r in llmops.doc_train_split(spark, SF_SMOKE).collect()}
    for r in out.collect():
        assert again[r["doc_id"]] == r["split"]


def test_pack_bins_respect_token_budget(spark):
    """No bin's PRIOR content exceeds the budget when a doc is placed: a
    doc goes to bin floor(cum_before/target), so within a (shard, bin)
    the first doc starts below the next budget boundary."""
    out = llmops.doc_pack_sequences(spark, SF_SMOKE).collect()
    target = llmops.PACK_TARGET_TOKENS
    for r in out:
        before = r["cum_tokens"] - r["n_tokens"]
        assert r["bin_id"] == before // target


def test_contamination_flags_eval_docs_only_from_corpus(spark):
    out = llmops.doc_contamination(spark, SF_SMOKE).collect()
    for r in out:
        assert r["doc_id"] % llmops.EVAL_STRIDE != 0  # training side
        assert r["eval_id"] % llmops.EVAL_STRIDE == 0  # benchmark side
        assert 0.0 <= r["overlap_frac"] <= 1.0
