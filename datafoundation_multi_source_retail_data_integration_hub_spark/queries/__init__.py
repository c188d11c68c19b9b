"""Analytics query library.

Each module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL). The driver
harness (``__spark_entry__.py``) aggregates them.

Float-parity contract: every computed float aggregate is rounded to 4
decimals *in both engines*, because double addition is order-dependent and
Spark's partial/final aggregation visits rows in a different order than the
oracle. Raw passthrough columns are never rounded.
"""

from . import (
    curation,
    eventops,
    llmops,
    multimodalops,
    pipelineops,
    profiling,
    quality,
    relational,
    relational_ext,
    textops,
    vectors,
    warehouse,
)

__all__ = [
    "curation",
    "eventops",
    "llmops",
    "multimodalops",
    "pipelineops",
    "profiling",
    "quality",
    "relational",
    "relational_ext",
    "textops",
    "vectors",
    "warehouse",
]
