"""Relational analytics queries (the reference's dashboard + README surface).

Re-expresses, on the driver-provisioned TPC-H-ish corpus, every analytic
the reference computes or documents:

- star join + KPI scalars      (reference ``dashboard/app.py:49-99``)
- grouped trends               (``dashboard/app.py:107,120,136,150``)
- monthly growth / YoY / share / top-k (``README.md:287-294``)
- rollup marts                 (``README.md:82-85``)

All queries are pure DataFrame/SQL plans: Catalyst handles predicate
pushdown into the parquet scans, column pruning, and join strategy
selection. Small dimensions (region, nation, customer, part at these
scales) are explicitly ``broadcast()``-hinted where the build side is
guaranteed dimension-sized even at 100 TB fact scale — the fact table
never shuffles for the star join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_tables

# Round float aggregates to 4 decimals in both engines: double addition is
# order-dependent, and partial aggregation order differs between Spark and
# the DuckDB oracle.
ROUND = 4


def _money(c: F.Column) -> F.Column:
    return F.round(c, ROUND)


def revenue_expr() -> F.Column:
    """The reference's revenue invariant: qty x price x (1 - discount)
    (reference ``README.md:104``; verified in dummy_retail_sales.csv) mapped
    onto lineitem as extendedprice x (1 - discount)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Flagship: star join + aggregate (scan, filter, 5-way join, agg in one plan)
# ---------------------------------------------------------------------------


def flagship_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region x part-type over the full star schema.

    Spark-first shape of the reference dashboard's BigQuery star join
    (``dashboard/app.py:53-57``): the big fact (lineitem) streams through
    broadcast-hash joins against every dimension — zero fact-side shuffle
    until the final 2-key aggregation, which is map-side partial-agg'd.
    """
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region", "part"
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    joined = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("p_type").alias("part_type")
    ).agg(
        _money(F.sum(revenue_expr())).alias("revenue"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        _money(F.avg("l_discount")).alias("avg_discount"),
    )


FLAGSHIP_ORACLE = """
SELECT r_name AS region_name, p_type AS part_type,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(DISTINCT l_orderkey) AS n_orders,
       round(avg(l_discount), 4) AS avg_discount
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape: the canonical scan+agg throughput query)
# ---------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"].filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = revenue_expr()
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _money(F.sum("l_quantity")).alias("sum_qty"),
        _money(F.sum("l_extendedprice")).alias("sum_base_price"),
        _money(F.sum(disc_price)).alias("sum_disc_price"),
        _money(F.sum(charge)).alias("sum_charge"),
        _money(F.avg("l_quantity")).alias("avg_qty"),
        _money(F.avg("l_extendedprice")).alias("avg_price"),
        _money(F.avg("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Dashboard KPI scalars (reference dashboard/app.py:95-99)
# ---------------------------------------------------------------------------


def kpi_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.agg(
        _money(F.sum(revenue_expr())).alias("total_revenue"),
        _money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "total_discount_amt"
        ),
        F.count("*").alias("n_lineitems"),
        _money(F.avg("l_extendedprice")).alias("avg_price"),
    )


KPI_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
       round(sum(l_extendedprice * l_discount), 4) AS total_discount_amt,
       count(*) AS n_lineitems,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Grouped trends (reference dashboard/app.py:107,136,150)
# ---------------------------------------------------------------------------


def daily_sales_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return orders.groupBy(F.col("o_orderdate").alias("order_date")).agg(
        _money(F.sum("o_totalprice")).alias("sales"),
        F.count("*").alias("n_orders"),
    )


DAILY_ORACLE = """
SELECT o_orderdate AS order_date,
       round(sum(o_totalprice), 4) AS sales,
       count(*) AS n_orders
FROM orders GROUP BY 1
"""


def segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            _money(F.sum("o_totalprice")).alias("sales"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


SEGMENT_ORACLE = """
SELECT c_mktsegment AS segment,
       round(sum(o_totalprice), 4) AS sales,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Monthly trend + growth via lag (README.md:287 — W1)
# ---------------------------------------------------------------------------


def monthly_trend_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum("o_totalprice").alias("rev"))
    # The window is unpartitioned, but it runs over ~1 row per month — the
    # heavy lifting (the aggregation) already reduced the data.
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "month",
        _money(F.col("rev")).alias("revenue"),
        _money(F.col("rev") - prev).alias("growth_abs"),
        _money((F.col("rev") - prev) * 100 / prev).alias("growth_pct"),
    )


MONTHLY_ORACLE = """
WITH m AS (
  -- DuckDB's date_trunc returns DATE; cast to TIMESTAMP to match Spark
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
)
SELECT month, round(rev, 4) AS revenue,
       round(rev - lag(rev) OVER (ORDER BY month), 4) AS growth_abs,
       round((rev - lag(rev) OVER (ORDER BY month)) * 100
             / lag(rev) OVER (ORDER BY month), 4) AS growth_pct
FROM m
"""


# ---------------------------------------------------------------------------
# Category revenue share (README.md:288 — W2; dashboard pie chart)
# ---------------------------------------------------------------------------


def category_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    cat = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("category"))
        .agg(F.sum(revenue_expr()).alias("rev"))
    )
    total = Window.partitionBy()  # share-of-total over the tiny aggregate
    return cat.select(
        "category",
        _money(F.col("rev")).alias("revenue"),
        _money(F.col("rev") * 100 / F.sum("rev").over(total)).alias(
            "revenue_share_pct"
        ),
    )


CATEGORY_SHARE_ORACLE = """
WITH c AS (
  SELECT p_type AS category, sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1
)
SELECT category, round(rev, 4) AS revenue,
       round(rev * 100 / sum(rev) OVER (), 4) AS revenue_share_pct
FROM c
"""


# ---------------------------------------------------------------------------
# Top customers (README.md:292 — W3/O3)
# ---------------------------------------------------------------------------


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    per_cust = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    # Deterministic top-k: tie-break on the key. orderBy+limit compiles to
    # TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    # driver; no global sort even at 100 TB.
    return (
        per_cust.orderBy(F.col("rev").desc(), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", _money(F.col("rev")).alias("revenue"))
    )


TOP_CUSTOMERS_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_name, sum(o_totalprice) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2
)
SELECT c_custkey, c_name, round(rev, 4) AS revenue
FROM c ORDER BY rev DESC, c_custkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Quarterly YoY (README.md:294 — W4)
# ---------------------------------------------------------------------------


def quarterly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    q = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.quarter("o_orderdate").alias("qtr")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.partitionBy("qtr").orderBy("yr")
    prev = F.lag("rev").over(w)
    return q.select(
        "yr",
        "qtr",
        _money(F.col("rev")).alias("revenue"),
        _money(prev).alias("prev_year_revenue"),
        _money((F.col("rev") - prev) * 100 / prev).alias("yoy_pct"),
    )


QUARTERLY_YOY_ORACLE = """
WITH q AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT yr, qtr, round(rev, 4) AS revenue,
       round(lag(rev) OVER (PARTITION BY qtr ORDER BY yr), 4) AS prev_year_revenue,
       round((rev - lag(rev) OVER (PARTITION BY qtr ORDER BY yr)) * 100
             / lag(rev) OVER (PARTITION BY qtr ORDER BY yr), 4) AS yoy_pct
FROM q
"""


# ---------------------------------------------------------------------------
# Rollup mart (README.md:82-85 mart aggregations — grouping sets)
# ---------------------------------------------------------------------------


def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "c_acctbal",
        )
    )
    return joined.rollup("region_name", "nation_name").agg(
        _money(F.sum("c_acctbal")).alias("total_acctbal"),
        F.count("*").alias("n_customers"),
    )


ROLLUP_ORACLE = """
SELECT r_name AS region_name, n_name AS nation_name,
       round(sum(c_acctbal), 4) AS total_acctbal,
       count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# Pivot (wide mart) — order counts by status x priority
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIAS = {
    "1-URGENT": "p_urgent",
    "2-HIGH": "p_high",
    "3-MEDIUM": "p_medium",
    "4-NOT SPECIFIED": "p_not_specified",
    "5-LOW": "p_low",
}


def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    pivoted = (
        orders.groupBy(F.col("o_orderstatus").alias("order_status"))
        .pivot("o_orderpriority", _PRIORITIES)  # explicit values: no extra pass
        .count()
    )
    cols = [F.col("order_status")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
        for p, a in _PRIORITY_ALIAS.items()
    ]
    return pivoted.select(*cols)


PIVOT_ORACLE = """
SELECT o_orderstatus AS order_status,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
       count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
       count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_not_specified,
       count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Filter domains (dashboard/app.py:74-81 — A9/O1) and buckets (F9)
# ---------------------------------------------------------------------------


def filter_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        orders.select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .orderBy("priority")
    )


FILTER_DOMAINS_ORACLE = """
SELECT DISTINCT o_orderpriority AS priority FROM orders ORDER BY 1
"""


def customer_balance_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise bucket derivation (reference README.md:126-127 F9)."""
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    tier = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
    )
    return (
        cust.select("c_custkey", "c_acctbal", tier.alias("balance_tier"))
    )


BALANCE_TIERS_ORACLE = """
SELECT c_custkey, c_acctbal,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS balance_tier
FROM customer
"""


QUERIES = {
    "flagship_star_revenue": flagship_star_revenue,
    "pricing_summary": pricing_summary,
    "kpi_summary": kpi_summary,
    "daily_sales_trend": daily_sales_trend,
    "segment_sales": segment_sales,
    "monthly_trend_growth": monthly_trend_growth,
    "category_share": category_share,
    "top_customers": top_customers,
    "quarterly_yoy": quarterly_yoy,
    "region_nation_rollup": region_nation_rollup,
    "order_priority_pivot": order_priority_pivot,
    "filter_domains": filter_domains,
    "customer_balance_tiers": customer_balance_tiers,
}

ORACLES = {
    "flagship_star_revenue": FLAGSHIP_ORACLE,
    "pricing_summary": PRICING_ORACLE,
    "kpi_summary": KPI_ORACLE,
    "daily_sales_trend": DAILY_ORACLE,
    "segment_sales": SEGMENT_ORACLE,
    "monthly_trend_growth": MONTHLY_ORACLE,
    "category_share": CATEGORY_SHARE_ORACLE,
    "top_customers": TOP_CUSTOMERS_ORACLE,
    "quarterly_yoy": QUARTERLY_YOY_ORACLE,
    "region_nation_rollup": ROLLUP_ORACLE,
    "order_priority_pivot": PIVOT_ORACLE,
    "filter_domains": FILTER_DOMAINS_ORACLE,
    "customer_balance_tiers": BALANCE_TIERS_ORACLE,
}
