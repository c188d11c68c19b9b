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


# Round-9 rotation: the driver records EXACTLY 50 rows per round
# (count cap, observed every recorded round r01-r08) against 145+
# declared queries — ordering decides which names get rows. _PRIORITY
# for r09 pins exactly the 50 names whose last green row is r05 (no
# row in the {r07, r08} window — r06 had no recording, so the stale
# backlog is a full round's worth). tests/test_rotation_staleness.py
# enforces this: every stale name must sit inside the front BUDGET
# (=50, the observed cap) positions. The two union-find consumers
# whose execution path changed in r08 (doc_neardup_clusters,
# doc_cluster_best) are in this set and re-record naturally;
# doc_dedup_decisions (also union-find, recorded green r08) gets a
# builder-side one-off oracle check instead of a driver slot.
# Names recorded green in r07/r08 come last via _modules() — they
# re-enter the front in r10 (sustainable at 145-150 declared:
# 2 recent rounds x 50 + front 50 = 150).
_PRIORITY = [
    # profiling / sketches / pruning — last green r05
    "customer_revenue_deciles",
    "order_grouping_sets",
    "lineitem_stats_profile",
    "join_key_skew_report",
    "orders_approx_distinct_sketch",
    "lineitem_quantile_sketch",
    "events_sketch_rollup",
    "events_user_overlap_theta",
    "dpp_dim_filtered_sales",
    "bloom_pruned_fact_join",
    "embedding_quantize_int8",
    # text / dedup family — last green r05
    "doc_text_stats",
    "doc_exact_dedup",
    "doc_dedup_keep_first",
    "doc_ngram_jaccard_pairs",
    "doc_minhash_lsh_pairs",
    "doc_simhash",
    "doc_simhash_pairs",
    "doc_winnowing_pairs",
    "doc_winnowing_fingerprints",
    "doc_neardup_clusters",  # union-find path changed r08 — re-verify
    "doc_incremental_dedup",
    "doc_lang_id",
    "doc_fingerprint",
    "doc_quality_filter",
    "doc_repetition_stats",
    "doc_hash_sample",
    "doc_chunk_windows",
    "doc_binary_stats",
    "doc_media_sampled",
    # curation — last green r05; segment_dedup + unigram_familiarity
    # rewritten this round (hash-shuffle / bounded broadcast) — their
    # r09 rows double as the regression gate for those rewrites
    "doc_segment_dedup",
    "doc_unigram_familiarity",
    "doc_cluster_best",  # union-find path changed r08 — re-verify
    "customer_pii_masked",
    # streaming — last green r05
    "stream_tumbling_counts",
    "stream_dedup_count",
    "stream_session_windows",
    "stream_scd2_upsert",
    "stream_click_attribution",
    "stream_static_enrichment",
    # events — last green r05
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
    # --- position 51+: new-in-r09 queries (never recorded; the
    # staleness guard's new-query grace window covers them — they are
    # next in line once the 50-name stale backlog clears in r10)
    "doc_pii_scrub",
]


def _modules():
    # After the pinned names: module order only decides the tail (names
    # recorded green in r07/r08, which the r09 budget skips). They
    # rotate back into _PRIORITY in r10 — at 145-150 declared queries
    # the 2-recent-rounds x 50 + front-50 window keeps every name
    # inside the staleness guard's bound.
    return [
        q.pipelineops,
        q.relational,
        q.relational_ext,
        q.quality,
        q.warehouse,
        q.vectors,
        q.profiling,
        q.llmops,
        streaming_pipelines,
        q.eventops,
        q.multimodalops,
        q.textops,
        q.curation,
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
