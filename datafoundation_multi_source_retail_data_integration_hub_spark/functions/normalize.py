"""Column-name normalization (reference ``etl/load_sales.py:13-18`` — P2).

The reference lowercases and replaces spaces/hyphens with underscores on
every column of the raw Superstore CSV. This is a driver-side rename (a
metadata-only projection in Spark — no data movement).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def normalize_name(name: str) -> str:
    """Lowercase; spaces/hyphens -> underscores; strip repeats/edges."""
    out = name.strip().lower().replace(" ", "_").replace("-", "_")
    out = re.sub(r"[^0-9a-z_]", "", out)
    return re.sub(r"_+", "_", out).strip("_")


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column via :func:`normalize_name` (metadata-only)."""
    return df.toDF(*[normalize_name(c) for c in df.columns])


def format_money(c, decimals: int = 2):
    """Presentation-layer currency formatting (reference F13,
    ``dashboard/app.py:96-99`` f-strings): grouped thousands + fixed
    decimals, e.g. 1234567.891 -> '1,234,567.89'. Engine-side so report
    sinks don't re-implement it."""
    from pyspark.sql import functions as F

    return F.format_number(c, decimals)
