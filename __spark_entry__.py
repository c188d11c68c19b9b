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


# Round-7 rotation: the driver records ~50 rows per round (count cap,
# observed r01-r05; NO r06 artifacts landed, so the recorded window is
# still r04+r05) against 137 declared queries — ordering decides which
# names get rows. _PRIORITY pins, in order:
#   (a) the 6 llmops-tail names whose last green row is r03 (the failing
#       rotation guard in r05 listed exactly these — 2 rounds stale);
#   (b) the 24 queries NEW in r06 (persisted sketch cube, audit replay,
#       partition-merge SCD2 publish, ANN quality report, batch +
#       streaming IVM, heavy hitters, fixed-point PageRank, observed
#       load, edit-distance near-dup, batch + streaming CDC compaction,
#       MAD outliers, layout skipping, Pareto, dedup decisions, mixture
#       allocation, key erasure, federated join, late-arriving dim)
#       with no row yet;
#   (d) the 8 queries NEW in r07 (substring dup report + keep-first
#       trim, language-balanced sample, partition planner, unicode NFC
#       clean, classifier score, join-cardinality estimate, k-anonymity)
#       with no row yet — (a)+(b)+(d) = 38, inside the front-40 guard;
#   (c) the names whose last green row is r04 (relational, warehouse,
#       vectors, quality families) — ~12 fit the remaining ~50-row
#       budget; the tail (most-stable scalar queries last) rotates to
#       the front of r08 (tests/test_rotation_staleness.py enforces it).
# Names recorded green in r05 come last via _modules() and are skipped
# by the r07 budget — they re-enter the front in r08.
_PRIORITY = [
    # (a) last green r03 — 2 rounds stale, must record in r06
    "doc_contamination",
    "doc_pack_sequences",
    "doc_stratified_sample",
    "doc_tfidf_top_terms",
    "doc_train_split",
    "vocab_top_tokens",
    # (b) new in r06 (no CORRECTNESS row exists yet)
    "events_sketch_cube",
    "stream_audit_replay",
    "scd2_partition_merge",
    "ann_quality_report",
    "mart_incremental_refresh",
    "events_heavy_hitters",
    "purchase_graph_pagerank",
    "stream_mart_refresh",
    "lineitem_observed_clean",
    "doc_edit_distance_pairs",
    "events_cdc_compaction",
    "events_mad_outliers",
    "fact_layout_skipping",
    "stream_cdc_compaction",
    "supplier_pareto",
    "doc_dedup_decisions",
    "doc_mixture_allocation",
    "warehouse_key_erasure",
    "federated_segment_revenue",
    "fact_late_arriving_dim",
    "orders_price_drift_screen",
    "events_rolling_distinct_users",
    "doc_media_resized",
    "warehouse_compaction_report",
    # (d) new in r07 (no CORRECTNESS row exists yet): substring dedup,
    # unicode cleaning, classifier scoring, join-size estimate, k-anon
    "doc_substring_dup_spans",
    "doc_substring_dedup_trim",
    "doc_substring_dedup_ingest",
    "stream_substring_dedup",
    "events_ewma_anomaly",
    "lineitem_equidepth_histogram",
    "dim_snapshot_diff",
    "embedding_matryoshka_recall",
    "doc_language_balanced_sample",
    "scan_partition_planner",
    "doc_unicode_clean",
    "doc_classifier_quality_score",
    "orders_join_cardinality",
    "customer_k_anonymity",
    # (c) last green r04 — relational core
    "flagship_star_revenue",
    "pricing_summary",
    "kpi_summary",
    "daily_sales_trend",
    "segment_sales",
    "category_share",
    "monthly_trend_growth",
    "quarterly_yoy",
    "top_customers",
    "shipping_priority_top10",
    "region_nation_rollup",
    "nation_purchasing_patterns",
    "supplier_nation_volume",
    "latest_order_per_customer",
    # (c) relational_ext / quality
    "parts_with_bulk_lineitems",
    "customers_without_open_orders",
    "lineitem_validation_summary",
    "scd2_customer_two_batch",
    "scd2_change_feed",
    "dim_customer_scd2_init",
    # (c) warehouse
    "fact_sales_resolution",
    "mart_sales_performance",
    "mart_category_analysis",
    "dashboard_extract",
    "bucketed_colocated_join",
    "salted_hot_key_join",
    "partitioned_fact_pruning",
    # (c) vectors / embeddings
    "embedding_topk_bruteforce",
    "embedding_ann_lsh",
    "embedding_ann_ivf",
    "embedding_ann_pq",
    "embedding_kmeans",
    "embedding_semantic_dedup",
    "embedding_cosine_neardup",
    "doc_hybrid_search_rrf",
    "doc_minhash_accuracy",
    # (c) events / profiling / streaming
    "events_rolling_anomaly",
    "order_price_percentiles",
    "order_priority_pivot",
    "stream_user_session_stats",
    # (c) tail: most-stable scalar queries — first to slide, r07 front
    "dim_date_calendar",
    "filter_domains",
    "customer_balance_tiers",
    "weekend_weekday_sales",
    "large_volume_customers",
    "product_catalog_overview",
    "fk_integrity_audit",
    "doc_length_histogram",
    "doc_source_stats",
]


def _modules():
    # After the pinned names: the r04-recorded families first (so any
    # r04 name the list above misses still lands early), then the
    # families fully re-recorded in r05 (streaming, eventops, textops,
    # curation, llmops, profiling) last — they are one round stale at
    # worst and rotate to the front in r07.
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
