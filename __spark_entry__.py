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


def _modules():
    # streaming first: if the driver's correctness run ever hits a global
    # time budget, the rarely-exercised streaming rows must already be
    # recorded (round 1 lost stream_dedup_count/stream_session_windows to
    # exactly this — the heavy doc/text queries ran before them)
    return [
        streaming_pipelines,
        q.relational,
        q.relational_ext,
        q.warehouse,
        q.quality,
        q.eventops,
        q.multimodalops,
        q.vectors,
        q.llmops,
        q.textops,
        q.curation,
        q.profiling,
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLES)
    return out
