"""Largest-remainder apportionment math (queries/llmops.mixture_quotas)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datafoundation_multi_source_retail_data_integration_hub_spark.queries.llmops import (
    mixture_quotas,
)


def test_hand_computed_example():
    # 10 slots at 1:2:3 -> exact shares 1.67/3.33/5.0 -> floors 1/3/5,
    # one leftover goes to the largest remainder (a: .67 vs b: .33)
    assert mixture_quotas({"a": 1, "b": 2, "c": 3}, 10) == {"a": 2, "b": 3, "c": 5}


def test_remainder_tie_breaks_by_name():
    # equal weights, 3 slots over 2 sources: floors 1/1, tie on the
    # remainder -> lexicographically first source gets the extra slot
    assert mixture_quotas({"b": 1, "a": 1}, 3) == {"a": 2, "b": 1}


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=1000),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=10_000),
)
def test_quota_invariants(weights, total):
    q = mixture_quotas(weights, total)
    # exact apportionment: quotas always sum to the target
    assert sum(q.values()) == total
    # quotas stay within one slot of the exact proportional share
    wsum = sum(weights.values())
    for s, w in weights.items():
        exact = total * w / wsum
        assert exact - 1 < q[s] < exact + 1
