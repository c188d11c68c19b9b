"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stateful semantics Spark's built-in operators don't
express (SURVEY §2.9 "custom stateful operators"): per-group state rides
in the state store across micro-batches, the user function sees Arrow
batches per group. State here is O(1) per user (a running float), so the
state store stays bounded without watermark eviction; operators holding
per-event state must pair with ``GroupStateTimeout`` eviction instead.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTAL_SCHEMA = "user_id long, running_value double, batch_rows long"
_STATE_SCHEMA = "total double, seen long"


def running_total_per_user(
    stream: DataFrame, user_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Streaming cumulative value per user: emits, each micro-batch, the
    user's updated lifetime total and the number of rows in that batch —
    the building block for quota/alerting pipelines."""

    def update(key, pdfs, state: GroupState):
        total, seen = state.get if state.exists else (0.0, 0)
        batch_rows = 0
        for pdf in pdfs:
            total += float(pdf[value_col].sum())
            batch_rows += len(pdf)
            seen += len(pdf)
        state.update((total, seen))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "running_value": [total],
                "batch_rows": [batch_rows],
            }
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        RUNNING_TOTAL_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
