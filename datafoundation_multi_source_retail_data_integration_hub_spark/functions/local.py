"""Driver-local rows -> DataFrame without the default-parallelism fan-out.

``SparkSession.createDataFrame(local_rows, schema)`` parallelizes the
rows into ``defaultParallelism`` slices — on local[32] every report
frame, audit row and offset table becomes a 32-partition RDD of which 31
are empty. Each downstream action then schedules 32 tasks (and a write
commits 32 files' worth of task commits) to move a handful of rows:
measured 0.39 s to append ONE audit row vs 0.23 s with a single slice
(optimization guide §2.2 — near-empty partitions are pure task-launch
overhead). ``coalesce(1)`` is NOT the fix: it evaluates all 32 pickled
parent partitions sequentially inside one task, each paying a Python
worker round trip (~4 s measured for the same single-row write).

``local_frame`` parallelizes with an explicit slice count sized to the
data (1 for the report/audit frames this engine builds; callers with
genuinely large driver-side payloads pass ``rows_per_slice`` to fan out
proportionally). Values, schema and row order are exactly those of the
plain ``createDataFrame`` call — only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(
    spark: SparkSession,
    rows,
    schema,
    rows_per_slice: int | None = None,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with data-sized slicing.

    ``rows`` must be a materialized sequence (list/tuple), never a lazy
    iterator — it is driver-local by definition here. With the default
    ``rows_per_slice=None`` everything lands in ONE slice; passing e.g.
    ``rows_per_slice=5000`` gives ``ceil(len(rows)/5000)`` slices for
    payloads big enough to want parallel downstream work.
    """
    rows = list(rows)
    if rows_per_slice:
        n = max(1, -(-len(rows) // rows_per_slice))
    else:
        n = 1
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), schema
    )
