"""Relational window-frame extensions: running totals, period-over-period
change, and partitioned top-k — the time-series shapes the reference
computes client-side (running total of day rows,
/root/reference/src/lambdas/earnings/earningsByDayOfWeek.py:219-233;
period-over-period comparison is the needle endpoint's whole purpose,
/root/reference/src/lambdas/earnings/needle.py:104-136) folded into the
engine as window functions.

Scale notes:
- the cumulative window partitions by the group key (returnflag platform
  stand-in), so state is per-partition and the window never sees the whole
  table in one task — unlike the reference's single-partition W1 ranking;
- month-over-month lag runs over an already-aggregated 12-row frame
  (dim-sized; the single-partition window is intentional and cheap);
- top-k-per-group uses a partitioned row_number — the scalable version of
  the reference's global ROW_NUMBER ranking
  (models_earning_distribution.py:100), ordered on the *exact integer*
  micros sum so rank order is identical on every engine and partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import (
    micros_to_amount,
    oracle_sum_micros,
    sum_micros,
)
from data_lake_spark.queries import QuerySpec
from data_lake_spark.queries.relational import (
    DATE_A,
    DATE_B,
    _d2s,
    _lineitem_dated,
    _orders_dated,
    _rev,
    _REV_SQL,
)

_SUMM_REV = oracle_sum_micros(_REV_SQL)


# ---------------------------------------------------------------------------
# running_total — cumulative revenue per platform over the date axis
# ---------------------------------------------------------------------------


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative daily revenue per returnflag: the reference's
    running-total post-processing (earningsByDayOfWeek.py:219-233) as a
    frame window. Sums stay in exact integer micros through the window, so
    the cumulative value is bit-identical at any partitioning; converted
    to double only at the output edge."""
    li = _lineitem_dated(spark, sf_dir)
    daily = (
        li.filter(F.col("l_date").between(DATE_A, "1996-03-31"))
        .groupBy(F.col("l_returnflag").alias("flag"), "l_date")
        .agg(sum_micros(_rev()).alias("rev_u"))
    )
    w = (
        Window.partitionBy("flag")
        .orderBy("l_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "flag",
        _d2s("l_date", "report_date"),
        micros_to_amount(F.col("rev_u")).alias("day_revenue"),
        micros_to_amount(F.sum("rev_u").over(w)).alias("cum_revenue"),
    ).orderBy("flag", "report_date")


ORACLE_RUNNING_TOTAL = f"""
WITH daily AS (
  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
         {_SUMM_REV} AS rev_u
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '1996-03-31'
  GROUP BY 1, 2
)
SELECT flag, STRFTIME(d, '%Y-%m-%d') AS report_date,
       CAST(rev_u AS DOUBLE) / 1000000.0 AS day_revenue,
       CAST(CAST(SUM(rev_u) OVER (PARTITION BY flag ORDER BY d) AS BIGINT)
            AS DOUBLE) / 1000000.0 AS cum_revenue
FROM daily ORDER BY flag, report_date
"""


# ---------------------------------------------------------------------------
# mom_change — month-over-month revenue change via lag
# ---------------------------------------------------------------------------


def q_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month percentage change: the needle endpoint's
    period-over-period comparison (needle.py:104-136) as a lag window over
    monthly exact sums. The lag subtraction happens on the integer micros
    (exact), then one double division at the edge — mirrored textually in
    the oracle so the pct is bit-identical."""
    li = _lineitem_dated(spark, sf_dir)
    monthly = (
        li.filter(F.col("l_date").between(DATE_A, DATE_B))
        .groupBy(F.date_format("l_date", "yyyy-MM").alias("month"))
        .agg(sum_micros(_rev()).alias("rev_u"))
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_u", F.lag("rev_u").over(w))
        .select(
            "month",
            micros_to_amount(F.col("rev_u")).alias("revenue"),
            F.coalesce(
                (F.col("rev_u") - F.col("prev_u")).cast("double")
                / F.col("prev_u").cast("double")
                * 100.0,
                F.lit(0.0),
            ).alias("mom_pct"),
        )
        .orderBy("month")
    )


ORACLE_MOM_CHANGE = f"""
WITH monthly AS (
  SELECT STRFTIME(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
         {_SUMM_REV} AS rev_u
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
  GROUP BY 1
),
lagged AS (
  SELECT month, rev_u, LAG(rev_u) OVER (ORDER BY month) AS prev_u FROM monthly
)
SELECT month, CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue,
       COALESCE(CAST(rev_u - prev_u AS DOUBLE) / CAST(prev_u AS DOUBLE) * 100.0,
                0.0) AS mom_pct
FROM lagged ORDER BY month
"""


# ---------------------------------------------------------------------------
# topk_per_group — partitioned ranking (the scalable W1)
# ---------------------------------------------------------------------------


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by total spend within each nation. The reference's
    ranking is a global single-partition window
    (models_earning_distribution.py:100); partitioning the window by the
    group key is how the same ranking scales — each nation ranks
    independently across executors. Rank order keys on the exact micros
    long (not the double), so ties and order are engine-identical."""
    orders = _orders_dated(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        orders.filter(F.col("o_date").between(DATE_A, DATE_B))
        .groupBy("o_custkey")
        .agg(sum_micros(F.col("o_totalprice")).alias("spend_u"))
    )
    joined = per_cust.join(
        cust, per_cust.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(
        F.col("spend_u").desc(), F.col("c_name")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_name").alias("customer"),
            micros_to_amount(F.col("spend_u")).alias("total_spend"),
            "rk",
        )
        .orderBy("nation", "rk")
    )


ORACLE_TOPK_PER_GROUP = f"""
WITH per_cust AS (
  SELECT o_custkey, {oracle_sum_micros('o_totalprice')} AS spend_u
  FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
  GROUP BY 1
),
ranked AS (
  SELECT n.n_name AS nation, c.c_name AS customer, p.spend_u,
         CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name
                                 ORDER BY p.spend_u DESC, c.c_name) AS BIGINT) AS rk
  FROM per_cust p
  JOIN customer c ON p.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation, customer, CAST(spend_u AS DOUBLE) / 1000000.0 AS total_spend, rk
FROM ranked WHERE rk <= 3 ORDER BY nation, rk
"""


REGISTRY: dict[str, QuerySpec] = {
    "running_total": QuerySpec(
        q_running_total, ORACLE_RUNNING_TOTAL,
        "cumulative window frame per platform (§2.13 running total)",
    ),
    "mom_change": QuerySpec(
        q_mom_change, ORACLE_MOM_CHANGE,
        "month-over-month lag window (needle period-over-period)",
    ),
    "topk_per_group": QuerySpec(
        q_topk_per_group, ORACLE_TOPK_PER_GROUP,
        "partitioned top-k ranking (scalable W1)",
    ),
}
