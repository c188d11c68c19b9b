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


def test_chunk_windows_cover_text_exactly(spark):
    """Chunk invariants: starts step by the stride from 0; every chunk is
    full-size except possibly the final ones; md5 of the reconstructed
    substring matches; the union of chunks covers every character (the
    stride never exceeds the chunk size, so no gaps)."""
    assert llmops.CHUNK_STRIDE <= llmops.CHUNK_SIZE
    docs = {
        r["doc_id"]: r["text"]
        for r in llmops._docs(spark, SF_SMOKE).select("doc_id", "text").collect()
    }
    out = llmops.doc_chunk_windows(spark, SF_SMOKE).collect()
    import hashlib
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in out:
        per_doc[r["doc_id"]].append(r)
    for doc_id, rows in per_doc.items():
        text = docs[doc_id]
        idxs = sorted(r["chunk_idx"] for r in rows)
        assert idxs == list(range(len(idxs)))  # contiguous chunk ids from 0
        # chunk count covers the whole text: last start < len <= next start
        assert (len(idxs) - 1) * llmops.CHUNK_STRIDE < len(text)
        assert len(text) <= len(idxs) * llmops.CHUNK_STRIDE
        for r in rows:
            start = r["chunk_idx"] * llmops.CHUNK_STRIDE
            expect = text[start : start + llmops.CHUNK_SIZE]
            assert r["chunk_len"] == len(expect)
            assert r["chunk_md5"] == hashlib.md5(expect.encode("utf-8")).hexdigest()
