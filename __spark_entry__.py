"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query on sf0.001.
``queries()`` / ``oracle_sql()`` aggregate every implemented operator's
(Spark callable, DuckDB oracle SQL) pair from the engine's query modules.
Names without an oracle entry are non-SQL-expressible ops (the driver
records a rows-only check for those).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafoundation_multi_source_retail_data_integration_hub_spark import queries as q
from datafoundation_multi_source_retail_data_integration_hub_spark.streaming import (
    pipelines as streaming_pipelines,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.relational.flagship_star_revenue(spark, "/root/testdata/sf0.001")


# Round-5 rotation: the correctness run has a global budget that covers
# ~50 of the 105 queries, so ordering decides which families get rows.
# _PRIORITY pins (a) embedding_quantize_int8 — r04's only red row (the
# codes column is now a sortable string), (b) the eight queries NEW in
# r05 (stream-stream + stream-static joins, HLL/KLL/theta/GK sketches,
# DPP, runtime bloom join) which have no row at all yet, and (c) every
# query whose last green row is r03: after r05 records, the staleness
# window becomes r04+r05, so the 47 r03-only names must sit inside the
# driver budget. That makes 56 names against a ~50-row budget — the
# llmops tail (vocab_top_tokens onward) may slide out of r05 and MUST
# rotate to the front of r06's list
# (tests/test_rotation_staleness.py enforces it).
_PRIORITY = [
    "embedding_quantize_int8",
    # new in r05 (no CORRECTNESS row exists yet)
    "stream_click_attribution",
    "orders_approx_distinct_sketch",
    "lineitem_quantile_sketch",
    "dpp_dim_filtered_sales",
    "events_sketch_rollup",
    "events_user_overlap_theta",
    "bloom_pruned_fact_join",
    "stream_static_enrichment",
    # streaming (r03-only)
    "stream_tumbling_counts",
    "stream_dedup_count",
    "stream_session_windows",
    "stream_scd2_upsert",
    # eventops batch twins (r03-only)
    "events_tumbling_10m",
    "events_sliding_10m_5m",
    "events_sessionization",
    "events_json_flatten",
    "events_first_per_user_type",
    "events_purchase_attribution",
    "events_close_pairs",
    "events_funnel",
    "events_retention_cohorts",
    "events_gapfill_10m",
    # multimodal (r03-only)
    "doc_binary_stats",
    "doc_media_sampled",
    # textops / dedup family (r03-only)
    "doc_quality_filter",
    "doc_repetition_stats",
    "doc_incremental_dedup",
    "doc_winnowing_pairs",
    "doc_text_stats",
    "doc_winnowing_fingerprints",
    "doc_neardup_clusters",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_exact_dedup",
    "doc_dedup_keep_first",
    "doc_ngram_jaccard_pairs",
    "doc_minhash_lsh_pairs",
    "doc_simhash",
    "doc_simhash_pairs",
    # curation (r03-only)
    "doc_segment_dedup",
    "doc_unigram_familiarity",
    "doc_cluster_best",
    "customer_pii_masked",
    # profiling tail (r03-only)
    "customer_revenue_deciles",
    "order_grouping_sets",
    "lineitem_stats_profile",
    "join_key_skew_report",
    # llmops (r03-only)
    "doc_hash_sample",
    "doc_chunk_windows",
    "doc_stratified_sample",
    "doc_train_split",
    "vocab_top_tokens",
    "doc_tfidf_top_terms",
    "doc_pack_sequences",
    "doc_contamination",
]


def _modules():
    # After the pinned names: the r03-only families first (so any name
    # the list above misses still lands early), then the families fully
    # re-recorded in r04 (warehouse, vectors, relational, quality) last —
    # they are one round stale at worst and rotate to the front in r06.
    return [
        streaming_pipelines,
        q.eventops,
        q.multimodalops,
        q.textops,
        q.curation,
        q.profiling,
        q.llmops,
        q.warehouse,
        q.vectors,
        q.relational,
        q.relational_ext,
        q.quality,
    ]


def _ordered(attr: str) -> dict:
    pools = [getattr(m, attr) for m in _modules()]
    out: dict = {}
    for name in _PRIORITY:
        for pool in pools:
            if name in pool:
                out[name] = pool[name]
                break
    for pool in pools:
        for name, v in pool.items():
            if name not in out:
                out[name] = v
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered("QUERIES")


def oracle_sql() -> dict[str, str]:
    return _ordered("ORACLES")
