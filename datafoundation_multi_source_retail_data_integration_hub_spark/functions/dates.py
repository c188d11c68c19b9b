"""Calendar / date-dimension derivations.

Re-expresses the reference's dim_date build (``etl/load_to_query.py:152-160``:
date_key = yyyyMMdd int, year, quarter, month, weekday) plus the documented
calendar attributes (``README.md:122-127,245``: is_weekend, fiscal_year,
full continuous calendar).

Parity notes:
- pandas ``dt.weekday`` is Mon=0..Sun=6; Spark's ``weekday()`` matches
  (unlike ``dayofweek()`` which is Sun=1). DuckDB parity: ``isodow - 1``.
- date_key is an int, not a date — the reference's fact/date join is
  int-on-int (SURVEY §2.3 note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FISCAL_YEAR_START_MONTH = 7  # documented fiscal calendar: FY starts in July


def date_key(c: Column) -> Column:
    """yyyyMMdd integer key (reference ``etl/load_to_query.py:156``)."""
    return F.date_format(c, "yyyyMMdd").cast("int")


def calendar_attrs(df: DataFrame, col: str = "date") -> DataFrame:
    """Attach the full calendar attribute set to a date column."""
    d = F.col(col)
    return df.select(
        d.alias("date"),
        date_key(d).alias("date_key"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.weekday(d).alias("weekday"),  # Mon=0 .. Sun=6 (pandas parity)
        (F.weekday(d) >= 5).cast("int").alias("is_weekend"),
        (F.year(d) + (F.month(d) >= FISCAL_YEAR_START_MONTH).cast("int")).alias(
            "fiscal_year"
        ),
    )


def build_calendar(df: DataFrame, date_col: str) -> DataFrame:
    """Continuous calendar dimension spanning min..max of ``date_col``.

    One tiny aggregate row -> ``sequence`` + ``explode`` generates the day
    range engine-side; no driver loop, no collect. A century of days is
    ~36k rows — always broadcastable, no matter the fact scale.
    """
    bounds = df.agg(
        F.min(F.to_date(date_col)).alias("lo"), F.max(F.to_date(date_col)).alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("date")
    )
    return calendar_attrs(days)
