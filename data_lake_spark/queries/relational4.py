"""Relational extensions, part 4: distribution analytics the reference's
dashboard layer approximates client-side — decile segmentation and exact
percentile reports, both single-shuffle window/aggregate plans.

The reference's ranking endpoint pages a global sort through the client
(detailedRanking.py:223-235); NTILE gives the same "where does this
account sit" answer as one windowed pass, and exact percentiles replace
eyeballing sorted output. Both partition by a group key, so no global
single-reducer window at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact
from data_lake_spark.queries import QuerySpec


def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles within each market segment: NTILE(10) over
    (segment, balance) with the customer key as a deterministic
    tie-break, then per-decile population and balance range."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("segment", "decile")
    )


ORACLE_NTILE_DECILES = """
WITH t AS (
  SELECT c_mktsegment AS segment, c_acctbal,
         CAST(NTILE(10) OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal ASC, c_custkey ASC)
              AS BIGINT) AS decile
  FROM customer
)
SELECT segment, decile, COUNT(*) AS n_customers,
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_percentile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-price percentiles per order priority: median and p90
    via the exact percentile aggregate (bit-identical to DuckDB
    quantile_cont including interpolation), plus an order-independent
    exact total. The reference reports only sums/averages; percentiles
    are the robust version of the same dashboard."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
            sum_exact("o_totalprice").alias("total_price"),
        )
        .orderBy("priority")
    )


ORACLE_PERCENTILE_REPORT = f"""
SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
       QUANTILE_CONT(o_totalprice, 0.5) AS median_price,
       QUANTILE_CONT(o_totalprice, 0.9) AS p90_price,
       {oracle_sum_exact("o_totalprice")} AS total_price
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass generic table profile (operators/profile.py) over the
    orders fact: per-column null counts + distinct cardinalities in a
    single aggregation — the drift alarm the reference's crawler-only
    catalog lacks."""
    from data_lake_spark.operators.profile import profile

    return profile(load_table(spark, sf_dir, "orders")).orderBy("col_name")


_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

ORACLE_PROFILE_ORDERS = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in _ORDER_COLS
) + "\nORDER BY col_name"


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL face (the
    registered-view path Athena users migrate onto): per (priority,
    status), per priority, and grand total — three report levels in ONE
    shuffle instead of the reference's UNION ALL of separate queries.
    Mixed sets are the case CUBE/ROLLUP can't express."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 AS total_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        ORDER BY priority, status
        """
    )


ORACLE_GROUPING_SETS = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) AS DOUBLE)
         / 1000000.0 AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
ORDER BY priority, status
"""


def q_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing revenue per day: a RANGE window frame over the
    date axis (value-based, so gaps in the calendar shrink the frame —
    unlike a ROWS frame, which would silently span missing days). Exact
    integer micros inside the frame keep both engines bit-identical."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )
    daily = orders.groupBy("d").agg(
        F.sum(F.floor(F.col("o_totalprice") * 1000000.0)).alias("rev_micros")
    )
    w = (
        Window.orderBy(F.col("d").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return (
        daily.withColumn(
            "trailing_7d",
            (F.sum("rev_micros").over(w).cast("double") / 1000000.0),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("report_date"),
            (F.col("rev_micros").cast("double") / 1000000.0).alias("revenue"),
            "trailing_7d",
        )
        .orderBy("report_date")
    )


ORACLE_TRAILING_7D = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)) AS BIGINT)
           AS rev_micros
  FROM orders GROUP BY 1
)
SELECT STRFTIME(d, '%Y-%m-%d') AS report_date,
       CAST(rev_micros AS DOUBLE) / 1000000.0 AS revenue,
       CAST(CAST(SUM(rev_micros) OVER (
              ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS DOUBLE) / 1000000.0 AS trailing_7d
FROM daily ORDER BY report_date
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type surface: per-order quantity arrays exercised through
    the higher-order-function family — sort, aggregate (fold), max,
    distinct, lambda filter, slice, transform — all JVM expressions
    inside codegen (the reference's nested data N1/N2 stops at explode;
    this is the rest of the array algebra a lake engine needs)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("q")
    )
    arrs = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("q")).alias("qs")
    )
    return arrs.select(
        "l_orderkey",
        F.size("qs").cast("long").alias("n_items"),
        F.aggregate("qs", F.lit(0).cast("long"), lambda a, x: a + x).alias("qty_sum"),
        F.array_max("qs").alias("qty_max"),
        F.size(F.array_distinct("qs")).cast("long").alias("n_distinct"),
        F.size(F.filter("qs", lambda x: x % 2 == 0)).cast("long").alias("n_even"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.reverse("qs"), 1, 3), lambda x: x.cast("string")
            ),
        ).alias("top3"),
    ).orderBy("l_orderkey")


ORACLE_ARRAY_FUNCS = """
WITH arrs AS (
  SELECT l_orderkey,
         LIST_SORT(LIST(CAST(l_quantity AS BIGINT))) AS qs
  FROM lineitem GROUP BY 1
)
SELECT l_orderkey,
       CAST(LEN(qs) AS BIGINT) AS n_items,
       CAST(LIST_SUM(qs) AS BIGINT) AS qty_sum,
       CAST(LIST_MAX(qs) AS BIGINT) AS qty_max,
       CAST(LEN(LIST_DISTINCT(qs)) AS BIGINT) AS n_distinct,
       CAST(LEN(LIST_FILTER(qs, x -> x % 2 = 0)) AS BIGINT) AS n_even,
       ARRAY_TO_STRING(LIST_SORT(qs, 'DESC')[1:3], ',') AS top3
FROM arrs ORDER BY l_orderkey
"""


def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-way star join (the TPC-H Q5 shape): lineitem ⋈ orders on the
    order key (the one genuine fact-fact join — sort-merge is correct
    there), then customer → nation → region resolved as a broadcast dim
    chain, 1996 orders only. One fact shuffle total; every dim hop is
    broadcast; the date filter pushes to the orders scan. This is the
    join-tree shape Catalyst must get right at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year(F.to_date("o_orderdate")) == 1996)
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("region", "nation")
        .agg(
            sum_exact("rev").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("region", "nation")
    )


ORACLE_REVENUE_BY_REGION = f"""
SELECT r.r_name AS region, n.n_name AS nation,
       {oracle_sum_exact("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE YEAR(CAST(o.o_orderdate AS DATE)) = 1996
GROUP BY 1, 2 ORDER BY 1, 2
"""


REGISTRY: dict[str, QuerySpec] = {
    "revenue_by_region": QuerySpec(
        q_revenue_by_region, ORACLE_REVENUE_BY_REGION,
        "TPC-H Q5-shape star join: fact-fact + broadcast dim chain",
    ),
    "array_funcs": QuerySpec(
        q_array_funcs, ORACLE_ARRAY_FUNCS,
        "higher-order array algebra per order (fold/filter/slice/transform)",
    ),
    "grouping_sets_report": QuerySpec(
        q_grouping_sets, ORACLE_GROUPING_SETS,
        "mixed GROUPING SETS via the SQL face, one shuffle",
    ),
    "trailing_7d": QuerySpec(
        q_trailing_7d, ORACLE_TRAILING_7D,
        "RANGE-frame 7-day trailing window over the date axis",
    ),
    "profile_orders": QuerySpec(
        q_profile_orders, ORACLE_PROFILE_ORDERS,
        "one-pass per-column profile (nulls, distinct) of a fact table",
    ),
    "ntile_deciles": QuerySpec(
        q_ntile_deciles, ORACLE_NTILE_DECILES,
        "NTILE(10) balance deciles per market segment",
    ),
    "percentile_report": QuerySpec(
        q_percentile_report, ORACLE_PERCENTILE_REPORT,
        "exact median/p90 percentiles per order priority",
    ),
}


# ---------------------------------------------------------------------------
# winsorize — robust-stats outlier clamping at exact per-group percentiles
# ---------------------------------------------------------------------------


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorization audit: order prices clamped to the
    group's exact [p05, p95], with pre/post exact totals and the clamp
    counts — the robust preprocessing step that keeps a fat-tailed
    metric from letting a few outliers own the mean.

    Plan: ONE grouped percentile aggregation over the fact (the
    percentile_report shape — map-side partials, 5 groups out), the
    5-row bounds frame broadcast back into a second scan, then a final
    map-side-combinable aggregate of the clamped values. Bounds are
    bit-identical to DuckDB QUANTILE_CONT (the established
    F.percentile parity); totals use the exact floor-micros sums, so
    the whole audit is engine- and partitioning-independent."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        orders.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("lo").alias("p05"),
            F.min("hi").alias("p95"),
            F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_lo"),
            F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_hi"),
            sum_exact("o_totalprice").alias("total_raw"),
            sum_exact(clamped).alias("total_winsorized"),
        )
        .orderBy("priority")
    )


ORACLE_WINSORIZE = f"""
WITH bounds AS (
  SELECT o_orderpriority,
         QUANTILE_CONT(o_totalprice, 0.05) AS lo,
         QUANTILE_CONT(o_totalprice, 0.95) AS hi
  FROM orders GROUP BY 1
)
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       MIN(b.lo) AS p05,
       MIN(b.hi) AS p95,
       CAST(SUM(CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped_lo,
       CAST(SUM(CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped_hi,
       {oracle_sum_exact("o.o_totalprice")} AS total_raw,
       {oracle_sum_exact("LEAST(GREATEST(o.o_totalprice, b.lo), b.hi)")}
         AS total_winsorized
FROM orders o JOIN bounds b USING (o_orderpriority)
GROUP BY 1 ORDER BY 1
"""


REGISTRY["winsorize"] = QuerySpec(
    q_winsorize,
    ORACLE_WINSORIZE,
    "per-group winsorization at exact p05/p95 with clamp counts and "
    "exact pre/post totals",
)
