"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stateful semantics Spark's built-in operators don't
express (SURVEY §2.9 "custom stateful operators"): per-group state rides
in the state store across micro-batches, the user function sees Arrow
batches per group (no row-at-a-time Python). State in both operators here
is one fixed-width tuple PER USER, hash partitioned by ``user_id`` across
executors by the state store — state size grows with |users|, never with
|events|, so it stays bounded without watermark eviction; operators
holding per-event state must pair with ``GroupStateTimeout`` eviction
instead.

- ``running_total_per_user``: cumulative value per user (quota/alerting
  building block; multi-batch state continuity covered by
  ``tests/test_stateful_streaming.py``).
- ``user_session_stats``: lifetime session statistics with a custom gap
  rule — the driver-facing query ``stream_user_session_stats`` replays it
  as two time-split ``availableNow`` runs through one checkpoint and
  gates the result against the batch lag/cumsum sessionization oracle.

Determinism contract for ``user_session_stats``: the transition assumes
micro-batches arrive in non-decreasing event-time order per user (the
time-split replay guarantees it). Within a batch the kernel concatenates
every Arrow chunk of the group and sorts the whole batch by timestamp
once, so intra-batch file/chunk order never matters — the pdfs iterator
delivers multiple chunks per group in arrival order, not time order. Session rule matches
``operators/sessionize.py``: a gap strictly greater than ``gap_seconds``
starts a new session; equal-timestamp events always share a session, so
ties cannot affect any output column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


SESSION_STATS_SCHEMA = (
    "user_id long, n_events long, n_sessions long, first_us long, last_us long"
)
_SESSION_STATE_SCHEMA = "n_events long, n_sessions long, first_us long, last_us long"


def session_transition(gap_us: int):
    """Build the per-group state-transition kernel used by
    ``user_session_stats``. Module-level (not a closure) so the property
    tests can drive it directly against a fake GroupState with arbitrary
    batch splits — the trickiest logic here is the cross-batch fold, and
    spinning a real stream per hypothesis example is infeasible."""

    def transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_events, n_sessions, first_us, last_us = state.get
        else:
            n_events, n_sessions, first_us, last_us = 0, 0, None, None
        # A group's micro-batch rows arrive as MULTIPLE Arrow chunks (the
        # iterator yields one pdf per ~arrow.maxRecordsPerBatch rows) in
        # partition/file order, NOT time order — sorting within each
        # chunk alone miscounts sessions for any user with more rows than
        # one chunk. Materialize the whole batch, sort once, fold once.
        chunks = [pdf["__us"] for pdf in pdfs if len(pdf)]
        if chunks:
            us = pd.concat(chunks).sort_values().reset_index(drop=True)
            n_events += len(us)
            if first_us is None:
                first_us = int(us.iloc[0])
            # new session at every strictly-greater-than-gap jump; the
            # first event ever (last_us None) opens session 1
            prev = us.shift(1)
            prev.iloc[0] = last_us if last_us is not None else float("nan")
            jumps = (us - prev) > gap_us
            n_sessions += int(jumps.sum()) + int(prev.isna().iloc[0])
            last_us = int(us.iloc[-1])
        state.update((n_events, n_sessions, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
                "first_us": [first_us],
                "last_us": [last_us],
            }
        )

    return transition


def user_session_stats(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Running (n_events, n_sessions, first_us, last_us) per user over a
    stream of events; emits each user's updated totals every micro-batch
    that touches the user (output mode: update — the LAST emission per
    user is the lifetime answer, and every emitted column is monotone, so
    late readers can fold sinks with max()).
    """
    transition = session_transition(gap_seconds * 1_000_000)

    prepped = events.select(
        "user_id", F.unix_micros(F.col("ts")).alias("__us")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        transition,
        SESSION_STATS_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
