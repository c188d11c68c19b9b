"""Data-quality / validation queries (reference P13: "Data validation",
"Type casting & validation", ``README.md:56,62``) and exact percentile
profiling.

Validation is expressed as aggregated constraint counters — one scan, all
rules evaluated as codegen'd conditional counts; at 100 TB this is the
only affordable shape (never row-by-row assertion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import fixed_sum, sql_stable_sum
from ..operators.quantiles import exact_quantile_edges
from ..sources.tables import load_tables


def lineitem_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    bad = {
        "n_nonpositive_price": F.col("l_extendedprice") <= 0,
        "n_discount_out_of_range": (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1),
        "n_tax_out_of_range": (F.col("l_tax") < 0) | (F.col("l_tax") > 1),
        "n_null_keys": F.col("l_orderkey").isNull() | F.col("l_partkey").isNull(),
        "n_ship_before_epoch": F.col("l_shipdate")
        < F.lit("1990-01-01").cast("timestamp"),
    }
    return li.agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in bad.items()
        ],
    )


LINEITEM_VALIDATION_ORACLE = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonpositive_price,
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discount_out_of_range,
       CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tax_out_of_range,
       CAST(sum(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_keys,
       CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ship_before_epoch
FROM lineitem
"""


def lineitem_observed_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan result + pipeline observability via ``Dataset.observe``:
    the cleaned per-flag revenue aggregate AND the load-audit counters
    (rows seen / rows dropped by the suspect rule) come from ONE pass
    over the fact — the metrics ride the same tasks as the aggregation,
    so at 100 TB the audit costs zero extra scans (the alternative, a
    separate validation query, rescans the corpus). The Observation's
    metrics become literal columns after the materializing action, so
    every output value is deterministic and oracle-checked — including
    that the observed counters equal an independent SQL recount."""
    from pyspark.sql import Observation

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    suspect = (F.col("l_discount") > 0.07) | (F.col("l_tax") > 0.06)
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(suspect.cast("long")).alias("n_dropped"),
    )
    agg = (
        observed.filter(~suspect)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            fixed_sum("l_extendedprice * (1 - l_discount)", 4).alias("revenue"),
        )
        # the action that finalizes the observation
        .localCheckpoint(eager=True)
    )
    m = obs.get
    return agg.select(
        "*",
        F.lit(int(m["n_total"])).alias("n_total_observed"),
        F.lit(int(m["n_dropped"])).alias("n_dropped_observed"),
    )


LINEITEM_OBSERVED_CLEAN_ORACLE = f"""
SELECT l_returnflag,
       count(*) AS n_items,
       {sql_stable_sum("l_extendedprice * (1 - l_discount)")} AS revenue,
       (SELECT count(*) FROM lineitem) AS n_total_observed,
       (SELECT CAST(sum(CASE WHEN l_discount > CAST(0.07 AS DOUBLE)
                               OR l_tax > CAST(0.06 AS DOUBLE)
                             THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
         AS n_dropped_observed
FROM lineitem
WHERE NOT (l_discount > CAST(0.07 AS DOUBLE) OR l_tax > CAST(0.06 AS DOUBLE))
GROUP BY 1
"""


def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (sort-based, order-independent — the
    same doubles fall out of any engine, no rounding needed). All five
    statistics come from ONE order-statistics pass
    (``operators.quantiles.exact_quantile_edges``; p=0.0/1.0 are the
    min/max ranks) — the earlier ``sorted_vals`` form reduced the whole
    column into a single-task array buffer, which this replaces with a
    count + rank-filter plan that stays distributed at any size."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    stats = exact_quantile_edges(
        orders, "o_totalprice", [0.5, 0.9, 0.99, 0.0, 1.0]
    )
    cols = ["p50", "p90", "p99", "min_price", "max_price"]
    if not stats:
        return spark.range(1).select(
            *[F.lit(None).cast("double").alias(c) for c in cols]
        )
    return spark.range(1).select(
        *[F.lit(x).alias(c) for x, c in zip(stats, cols)]
    )


ORDER_PERCENTILES_ORACLE = """
SELECT quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
"""


# (child table, child FK col, parent table, parent PK col) — every edge of
# the star/snowflake. Declared once so the Spark build and the SQL oracle
# iterate the same list.
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the schema: child
    row count, orphan rows (no matching parent key — NULL FKs count as
    orphans), and distinct orphan key values. The load-gate a warehouse
    runs after ingest and before publishing (reference P13 validation,
    promoted from per-column rules to cross-table rules).

    Scale shape: one left join per edge against the DISTINCT parent key
    set — parent keys are dimension-sized for every edge except
    lineitem->orders (where the join is the same orderkey co-shuffle the
    fact build already pays, eliminable via the bucketed layout); the
    per-edge result is a single aggregated row, so the union is 7 rows.
    """
    from functools import reduce

    tables = {t for edge in _FK_EDGES for t in (edge[0], edge[2])}
    t = load_tables(spark, sf_dir, *sorted(tables))
    frames = []
    for child, ck, parent, pk in _FK_EDGES:
        joined = (
            t[child]
            .select(F.col(ck).alias("k"))
            .join(
                t[parent]
                .select(F.col(pk).alias("pk"))
                .distinct()
                .withColumn("__hit", F.lit(1)),
                F.col("k") == F.col("pk"),
                "left",
            )
        )
        frames.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
                    "n_orphan_rows"
                ),
                F.countDistinct(
                    F.when(F.col("__hit").isNull(), F.col("k"))
                ).alias("n_orphan_keys"),
            ).select(
                F.lit(f"{child}.{ck}->{parent}").alias("relationship"),
                "n_child_rows",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


def _sql_fk_audit_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        parts.append(
            f"""
SELECT '{child}.{ck}->{parent}' AS relationship,
       count(*) AS n_child_rows,
       CAST(sum(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan_rows,
       count(DISTINCT CASE WHEN p.pk IS NULL THEN c.k END) AS n_orphan_keys
FROM (SELECT {ck} AS k FROM {child}) c
LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON c.k = p.pk"""
        )
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Distribution drift screen (PSI-shaped, rational arithmetic only)
# ---------------------------------------------------------------------------

DRIFT_DECILES = [i / 10 for i in range(1, 10)]


def orders_price_drift_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-over-batch distribution drift for the order-price column:
    the reference batch (even order keys) defines decile edges; both
    batches are histogrammed against those SAME edges; per bucket the
    screen emits the triangular discrepancy ``(p-q)^2 / (p+q)`` — a
    PSI-style statistic built from RATIONAL arithmetic only (PSI's
    ``ln(p/q)`` is libm-dependent across engines; this one is exactly
    portable and shares PSI's zero-at-identical, grows-with-shift
    shape).

    Scale shape: edges are exact order statistics
    (``operators.quantiles.exact_quantile_edges`` — <=18 rows leave the
    executors; distributed numbering above the bench threshold), then
    ONE pass histogramming both batches — bucket
    assignment is a 9-comparison fold against broadcast edge literals,
    the counts partial-aggregate map-side, and the grand totals come
    from an unbounded window over the 10-row bucket aggregate (the old
    ``crossJoin(totals)`` recomputed the histogram scan twice)."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    ref = orders.where(F.col("o_orderkey") % 2 == 0)
    edges = exact_quantile_edges(ref, "o_totalprice", DRIFT_DECILES)
    bucket = (
        sum((F.col("o_totalprice") >= F.lit(e)).cast("int") for e in edges)
        if edges
        else F.lit(0)
    ).alias("bucket")
    hist = (
        orders.select(
            bucket, (F.col("o_orderkey") % 2 == 0).alias("is_ref")
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    # grand totals over the <=10-row bucket aggregate: an unbounded
    # window on the aggregate output (single tiny partition) instead of
    # a separate agg + crossJoin, which re-ran the orders scan twice
    tot = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = F.col("n_ref").cast("double") / F.sum("n_ref").over(tot).cast("double")
    q = F.col("n_cur").cast("double") / F.sum("n_cur").over(tot).cast("double")
    return hist.select(
        "bucket",
        "n_ref",
        "n_cur",
        p.alias("share_ref"),
        q.alias("share_cur"),
        ((p - q) * (p - q) / (p + q)).alias("drift"),
    )


def _sql_drift_oracle() -> str:
    probs = ", ".join(str(p) for p in DRIFT_DECILES)
    return f"""
WITH ref AS (SELECT o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0),
e AS (SELECT unnest(quantile_cont(v, [{probs}])) AS edge FROM ref),
b AS (
  SELECT (SELECT CAST(count(*) AS INT) FROM e WHERE o.o_totalprice >= e.edge)
           AS bucket,
         (o_orderkey % 2 = 0) AS is_ref
  FROM orders o
),
hist AS (
  SELECT bucket,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
  FROM b GROUP BY 1
),
t AS (SELECT sum(n_ref) AS r, sum(n_cur) AS c FROM hist)
SELECT bucket,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       CAST(n_ref AS DOUBLE) / CAST(r AS DOUBLE) AS share_ref,
       CAST(n_cur AS DOUBLE) / CAST(c AS DOUBLE) AS share_cur,
       (CAST(n_ref AS DOUBLE) / CAST(r AS DOUBLE)
          - CAST(n_cur AS DOUBLE) / CAST(c AS DOUBLE))
       * (CAST(n_ref AS DOUBLE) / CAST(r AS DOUBLE)
          - CAST(n_cur AS DOUBLE) / CAST(c AS DOUBLE))
       / (CAST(n_ref AS DOUBLE) / CAST(r AS DOUBLE)
          + CAST(n_cur AS DOUBLE) / CAST(c AS DOUBLE)) AS drift
FROM hist, t
"""


QUERIES = {
    "orders_price_drift_screen": orders_price_drift_screen,
    "lineitem_validation_summary": lineitem_validation_summary,
    "order_price_percentiles": order_price_percentiles,
    "fk_integrity_audit": fk_integrity_audit,
    "lineitem_observed_clean": lineitem_observed_clean,
}

ORACLES = {
    "orders_price_drift_screen": _sql_drift_oracle(),
    "lineitem_validation_summary": LINEITEM_VALIDATION_ORACLE,
    "order_price_percentiles": ORDER_PERCENTILES_ORACLE,
    "fk_integrity_audit": _sql_fk_audit_oracle(),
    "lineitem_observed_clean": LINEITEM_OBSERVED_CLEAN_ORACLE,
}
