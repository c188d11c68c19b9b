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


# Round-4 rotation: the correctness run has a global budget that covers
# ~50 of the 89 queries, so ordering decides which families get rows.
# _PRIORITY pins the individual queries that MUST record this round:
# the six that have never had any CORRECTNESS row (marts, dashboard
# extract, int8 quantization, PQ-ADC ANN, hybrid RRF) and the two whose
# oracles were fixed this round (BIGINT casts on sum(n_chars)).
_PRIORITY = [
    "mart_sales_performance",
    "mart_category_analysis",
    "dashboard_extract",
    "embedding_quantize_int8",
    "embedding_ann_pq",
    "doc_hybrid_search_rrf",
    "doc_source_stats",
    "doc_length_histogram",
    # new this round: the salting + bucketing demos and the stateful
    # session-stats stream must record first rows
    "salted_hot_key_join",
    "bucketed_colocated_join",
    "stream_user_session_stats",
    "partitioned_fact_pruning",
    "events_rolling_anomaly",
    "doc_minhash_accuracy",
    "fk_integrity_audit",
    "scd2_change_feed",
]


def _modules():
    # After the pinned names, families ordered by staleness: warehouse /
    # vectors / relational / relational_ext / quality got no r03 row
    # (last green r01/r02 — two rounds stale if skipped again), so they
    # run next; the families recorded green in r03 (streaming, eventops,
    # multimodal, textops, curation, profiling, llmops) run last and may
    # be cut off by the budget — they are only one round stale then, and
    # the r05 rotation must front-load them in turn.
    return [
        q.warehouse,
        q.vectors,
        q.relational,
        q.relational_ext,
        q.quality,
        streaming_pipelines,
        q.eventops,
        q.multimodalops,
        q.textops,
        q.curation,
        q.profiling,
        q.llmops,
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
