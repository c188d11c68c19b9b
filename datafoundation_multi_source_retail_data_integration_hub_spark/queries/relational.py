"""Relational analytics queries (the reference's dashboard + README surface).

Re-expresses, on the driver-provisioned TPC-H-ish corpus, every analytic
the reference computes or documents:

- star join + KPI scalars      (reference ``dashboard/app.py:49-99``)
- grouped trends               (``dashboard/app.py:107,120,136,150``)
- monthly growth / YoY / share / top-k (``README.md:287-294``)
- rollup marts                 (``README.md:82-85``)

All queries are pure DataFrame/SQL plans: Catalyst handles predicate
pushdown into the parquet scans, column pruning, and join strategy
selection. Broadcast policy: only constant-cardinality dimensions
(region: 5 rows, nation: 25 rows) carry a hard ``broadcast()`` hint —
they are bounded at ANY scale factor. Customer/part/supplier scale with
the corpus, so their join strategy is left to Catalyst's size estimate +
AQE's runtime re-plan: auto-broadcast at test scale, shuffle-hash or
sort-merge (or bucketed co-location, see ARCHITECTURE.md) at 100 TB. A
hard hint there would OOM the build side at scale.

Float parity: every order-dependent double aggregate goes through the
``functions.parity`` helpers (see that module's doc for why plain
``round(sum(double), 4)`` is not cross-engine stable). This module uses
the fixed-point long fast path (``fixed_sum``/``fixed_avg``/
``fixed_sum_dec``): the corpus money columns have known decimal scales
(DP_* constants below), so sums accumulate as exact long limbs inside
whole-stage codegen — bit-identical to the decimal path at ~2.5x the
single-scan aggregation throughput. The DuckDB oracles keep the plain
DECIMAL formulation: the two are independent routes to the same exact
value, which is the point of the parity gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import (
    fixed_avg,
    fixed_sum,
    fixed_sum_dec,
    round_dp,
    sql_round_dp,
    sql_stable_avg,
    sql_stable_sum,
)
from ..sources.tables import load_tables


def revenue_expr() -> F.Column:
    """The reference's revenue invariant: qty x price x (1 - discount)
    (reference ``README.md:104``; verified in dummy_retail_sales.csv) mapped
    onto lineitem as extendedprice x (1 - discount)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# True decimal scales of the corpus money surface — the ``dp`` contracts
# the fixed-point fast path (functions.parity) relies on. Prices and
# balances carry 2 decimals; discount/tax carry 2; so revenue
# price*(1-disc) is exact at 4 and charge revenue*(1+tax) at 6.
DP_MONEY = 2
DP_REVENUE = 4
DP_CHARGE = 6


_SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


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
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("p_type").alias("part_type")
    ).agg(
        fixed_sum(_SQL_REVENUE, DP_REVENUE).alias("revenue"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        fixed_avg("l_discount", DP_MONEY).alias("avg_discount"),
    )


FLAGSHIP_ORACLE = f"""
SELECT r_name AS region_name, p_type AS part_type,
       {sql_stable_sum(_SQL_REVENUE)} AS revenue,
       count(DISTINCT l_orderkey) AS n_orders,
       {sql_stable_avg("l_discount")} AS avg_discount
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
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        fixed_sum("l_quantity", DP_MONEY).alias("sum_qty"),
        fixed_sum("l_extendedprice", DP_MONEY).alias("sum_base_price"),
        fixed_sum(_SQL_REVENUE, DP_REVENUE).alias("sum_disc_price"),
        fixed_sum(_SQL_REVENUE + " * (1 + l_tax)", DP_CHARGE).alias("sum_charge"),
        fixed_avg("l_quantity", DP_MONEY).alias("avg_qty"),
        fixed_avg("l_extendedprice", DP_MONEY).alias("avg_price"),
        fixed_avg("l_discount", DP_MONEY).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


PRICING_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_stable_sum("l_quantity")} AS sum_qty,
       {sql_stable_sum("l_extendedprice")} AS sum_base_price,
       {sql_stable_sum(_SQL_REVENUE)} AS sum_disc_price,
       {sql_stable_sum(_SQL_REVENUE + " * (1 + l_tax)")} AS sum_charge,
       {sql_stable_avg("l_quantity")} AS avg_qty,
       {sql_stable_avg("l_extendedprice")} AS avg_price,
       {sql_stable_avg("l_discount")} AS avg_disc,
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
        fixed_sum(_SQL_REVENUE, DP_REVENUE).alias("total_revenue"),
        fixed_sum(
            "l_extendedprice * l_discount", DP_REVENUE
        ).alias("total_discount_amt"),
        F.count("*").alias("n_lineitems"),
        fixed_avg("l_extendedprice", DP_MONEY).alias("avg_price"),
    )


KPI_ORACLE = f"""
SELECT {sql_stable_sum(_SQL_REVENUE)} AS total_revenue,
       {sql_stable_sum("l_extendedprice * l_discount")} AS total_discount_amt,
       count(*) AS n_lineitems,
       {sql_stable_avg("l_extendedprice")} AS avg_price
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Grouped trends (reference dashboard/app.py:107,136,150)
# ---------------------------------------------------------------------------


def daily_sales_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return orders.groupBy(F.col("o_orderdate").alias("order_date")).agg(
        fixed_sum("o_totalprice", DP_MONEY).alias("sales"),
        F.count("*").alias("n_orders"),
    )


DAILY_ORACLE = f"""
SELECT o_orderdate AS order_date,
       {sql_stable_sum("o_totalprice")} AS sales,
       count(*) AS n_orders
FROM orders GROUP BY 1
"""


def segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            fixed_sum("o_totalprice", DP_MONEY).alias("sales"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


SEGMENT_ORACLE = f"""
SELECT c_mktsegment AS segment,
       {sql_stable_sum("o_totalprice")} AS sales,
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
    ).agg(fixed_sum_dec("o_totalprice", DP_MONEY).alias("rev_dec"))
    # The window is unpartitioned, but it runs over ~1 row per month — the
    # heavy lifting (the aggregation) already reduced the data.
    w = Window.orderBy("month")
    rev = F.col("rev_dec").cast("double")
    prev = F.lag("rev_dec").over(w).cast("double")
    return monthly.select(
        "month",
        round_dp(rev).alias("revenue"),
        round_dp(rev - prev).alias("growth_abs"),
        round_dp((rev - prev) * 100 / prev).alias("growth_pct"),
    )


MONTHLY_ORACLE = f"""
WITH m AS (
  -- DuckDB's date_trunc returns DATE; cast to TIMESTAMP to match Spark
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         sum(CAST(o_totalprice AS DECIMAL(27,6))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT month,
       {sql_round_dp("CAST(rev_dec AS DOUBLE)")} AS revenue,
       {sql_round_dp("CAST(rev_dec AS DOUBLE) - CAST(lag(rev_dec) OVER (ORDER BY month) AS DOUBLE)")}
         AS growth_abs,
       {sql_round_dp("(CAST(rev_dec AS DOUBLE) - CAST(lag(rev_dec) OVER (ORDER BY month) AS DOUBLE)) * 100 / CAST(lag(rev_dec) OVER (ORDER BY month) AS DOUBLE)")}
         AS growth_pct
FROM m
"""


# ---------------------------------------------------------------------------
# Category revenue share (README.md:288 — W2; dashboard pie chart)
# ---------------------------------------------------------------------------


def category_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    cat = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("category"))
        .agg(fixed_sum_dec(_SQL_REVENUE, DP_REVENUE).alias("rev_dec"))
    )
    # share-of-total over the tiny aggregate; decimal window sum stays exact
    total = F.sum("rev_dec").over(Window.partitionBy())
    rev = F.col("rev_dec").cast("double")
    return cat.select(
        "category",
        round_dp(rev).alias("revenue"),
        round_dp(rev * 100 / total.cast("double")).alias("revenue_share_pct"),
    )


CATEGORY_SHARE_ORACLE = f"""
WITH c AS (
  SELECT p_type AS category,
         sum(CAST({_SQL_REVENUE} AS DECIMAL(27,6))) AS rev_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1
)
SELECT category,
       {sql_round_dp("CAST(rev_dec AS DOUBLE)")} AS revenue,
       {sql_round_dp("CAST(rev_dec AS DOUBLE) * 100 / CAST(sum(rev_dec) OVER () AS DOUBLE)")} AS revenue_share_pct
FROM c
"""


# ---------------------------------------------------------------------------
# Top customers (README.md:292 — W3/O3)
# ---------------------------------------------------------------------------


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    per_cust = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(fixed_sum_dec("o_totalprice", DP_MONEY).alias("rev_dec"))
    )
    # Deterministic top-k: exact decimal revenue ordering + key tie-break.
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition top-k
    # then a k-row merge on the driver; no global sort even at 100 TB.
    return (
        per_cust.orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(10)
        .select(
            "c_custkey",
            "c_name",
            round_dp(F.col("rev_dec").cast("double")).alias("revenue"),
        )
    )


TOP_CUSTOMERS_ORACLE = f"""
WITH c AS (
  SELECT c_custkey, c_name, sum(CAST(o_totalprice AS DECIMAL(27,6))) AS rev_dec
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2
)
SELECT c_custkey, c_name, {sql_round_dp("CAST(rev_dec AS DOUBLE)")} AS revenue
FROM c ORDER BY rev_dec DESC, c_custkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Quarterly YoY (README.md:294 — W4)
# ---------------------------------------------------------------------------


def quarterly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    q = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.quarter("o_orderdate").alias("qtr")
    ).agg(fixed_sum_dec("o_totalprice", DP_MONEY).alias("rev_dec"))
    w = Window.partitionBy("qtr").orderBy("yr")
    rev = F.col("rev_dec").cast("double")
    prev = F.lag("rev_dec").over(w).cast("double")
    return q.select(
        "yr",
        "qtr",
        round_dp(rev).alias("revenue"),
        round_dp(prev).alias("prev_year_revenue"),
        round_dp((rev - prev) * 100 / prev).alias("yoy_pct"),
    )


QUARTERLY_YOY_ORACLE = f"""
WITH q AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
         sum(CAST(o_totalprice AS DECIMAL(27,6))) AS rev_dec
  FROM orders GROUP BY 1, 2
)
SELECT yr, qtr,
       {sql_round_dp("CAST(rev_dec AS DOUBLE)")} AS revenue,
       {sql_round_dp("CAST(lag(rev_dec) OVER (PARTITION BY qtr ORDER BY yr) AS DOUBLE)")}
         AS prev_year_revenue,
       {sql_round_dp("(CAST(rev_dec AS DOUBLE) - CAST(lag(rev_dec) OVER (PARTITION BY qtr ORDER BY yr) AS DOUBLE)) * 100 / CAST(lag(rev_dec) OVER (PARTITION BY qtr ORDER BY yr) AS DOUBLE)")}
         AS yoy_pct
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
        fixed_sum("c_acctbal", DP_MONEY).alias("total_acctbal"),
        F.count("*").alias("n_customers"),
    )


ROLLUP_ORACLE = f"""
SELECT r_name AS region_name, n_name AS nation_name,
       {sql_stable_sum("c_acctbal")} AS total_acctbal,
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
    return cust.select("c_custkey", "c_acctbal", tier.alias("balance_tier"))


BALANCE_TIERS_ORACLE = """
SELECT c_custkey, c_acctbal,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS balance_tier
FROM customer
"""


# ---------------------------------------------------------------------------
# Pareto / cumulative-share analysis (80/20 concentration)
# ---------------------------------------------------------------------------


def supplier_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across suppliers: rank by exact revenue,
    cumulative share of the running total, and the 80%-tier flag (a
    supplier is in the top-80 tier while the cumulative share BEFORE it
    is under 0.8 — the boundary test runs in exact decimal arithmetic,
    ``(cum - rev) * 5 < tot * 4``, so no float compare sits on the cut).

    Exactness: per-supplier revenue and every cumulative value stay in
    DECIMAL (order-independent, engine-agnostic); doubles appear only in
    the final presented columns. Scale shape: one groupBy shuffle to
    supplier grain (pre-aggregated map-side), then ONE window over the
    supplier-count-sized frame — windows order the aggregate, never the
    fact."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(revenue_expr().cast("decimal(27,6)")).alias("u")
    )
    w = Window.orderBy(F.col("u").desc(), "s_suppkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = rev.select(
        "s_suppkey",
        "u",
        F.row_number().over(w).alias("pareto_rank"),
        F.sum("u").over(run).alias("cum"),
        F.sum("u").over(full).alias("tot"),
    )
    return ranked.select(
        "s_suppkey",
        "pareto_rank",
        round_dp(F.col("u").cast("double")).alias("revenue"),
        round_dp(
            F.col("cum").cast("double") / F.col("tot").cast("double")
        ).alias("cum_share"),
        (
            (F.col("cum") - F.col("u")) * F.lit(5) < F.col("tot") * F.lit(4)
        ).alias("in_top80"),
    )


SUPPLIER_PARETO_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST({_SQL_REVENUE} AS DECIMAL(27,6))) AS u
  FROM lineitem GROUP BY 1
),
w AS (
  SELECT s_suppkey, u,
         row_number() OVER (ORDER BY u DESC, s_suppkey) AS pareto_rank,
         sum(u) OVER (ORDER BY u DESC, s_suppkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(u) OVER () AS tot
  FROM rev
)
SELECT s_suppkey, pareto_rank,
       {sql_round_dp("CAST(u AS DOUBLE)")} AS revenue,
       {sql_round_dp("CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)")} AS cum_share,
       ((cum - u) * 5 < tot * 4) AS in_top80
FROM w
"""


QUERIES = {
    "supplier_pareto": supplier_pareto,
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
    "supplier_pareto": SUPPLIER_PARETO_ORACLE,
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
