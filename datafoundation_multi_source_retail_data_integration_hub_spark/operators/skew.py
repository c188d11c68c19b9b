"""Skew-aware join: key salting.

AQE's skew-join splitting (enabled in ``session.py``) handles most skew at
runtime, but it only splits *sort-merge* join partitions. When a hot key
dominates a shuffled hash join (one customer with 10% of a 100 TB fact),
explicit salting is the deterministic fix:

- fact side: append a random-ish salt in [0, S) to the hot keys,
- dim side: replicate hot-key rows S times (explode over the salt range),
- join on (key, salt) — the hot key's rows now spread over S partitions.

Only the listed hot keys are salted: the dim side grows by
|hot keys| x S rows, not |dim| x S.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_large_side(
    df: DataFrame, key: str, hot_keys: list, n_salts: int
) -> DataFrame:
    """Deterministic salt on the probe (large) side: hot keys spread over
    ``n_salts`` buckets via a hash of the whole row's key + a stable
    per-row component; cold keys get salt 0."""
    is_hot = F.col(key).isin(hot_keys)
    # xxhash64 of (key, monotonically varying partition offset) would be
    # nondeterministic across retries; spraying by hash of all columns is
    # stable per row and uniform enough for load-balancing
    spray = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    return df.withColumn(SALT_COL, F.when(is_hot, spray).otherwise(F.lit(0)))


def replicate_small_side(
    df: DataFrame, key: str, hot_keys: list, n_salts: int
) -> DataFrame:
    """Build (key, salt) coverage on the build (small) side: hot keys are
    exploded over all salts, cold keys carry salt 0."""
    is_hot = F.col(key).isin(hot_keys)
    salts = F.when(
        is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(0)))
    return df.withColumn(SALT_COL, F.explode(salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the listed hot keys salted across
    ``n_salts`` buckets. Semantically identical to
    ``large.join(small, key, how)`` for inner/left joins — and ONLY
    those: the small side is replicated per salt, so right/full joins
    would emit every unmatched hot small-side row n_salts times."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(the replicated small side would duplicate unmatched rows)"
        )
    lg = salt_large_side(large, key, hot_keys, n_salts)
    sm = replicate_small_side(small, key, hot_keys, n_salts)
    return lg.join(sm, [key, SALT_COL], how).drop(SALT_COL)
