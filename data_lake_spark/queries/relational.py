"""Relational-core queries (SURVEY §2.2-§2.10) over the driver testdata.

Every operator the reference exercises is re-expressed Spark-first over the
TPC-H-ish star schema (FIXTURES.md §B maps reference tables → testdata
stand-ins: customer≈users dim, orders/lineitem≈model-performance facts,
o_orderpriority split≈jasmin/streamate platforms). Each entry pairs the
DataFrame implementation with bit-identical DuckDB oracle SQL.

Cross-engine determinism conventions (mirrored textually in each oracle):
- money sums use ``functions.exact`` floor-to-integer-micros (exact,
  associative — safe at any cluster size);
- dates are output as 'YYYY-MM-DD' strings (the reference's own
  date-as-string idiom, earnings.py:76);
- integer outputs are cast to long/BIGINT on both sides.

Reference citations (files under /root/reference/) are per-query in
docstrings.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.dates import dow_presto, week_presto
from data_lake_spark.functions.exact import (
    micros_to_amount,
    oracle_sum_exact,
    oracle_sum_micros,
    sum_exact,
    sum_micros,
)
from data_lake_spark.operators.ranking import (
    global_row_number,
    top_k,
    with_broadcast_scalar,
)
from data_lake_spark.queries import QuerySpec

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

DATE_A, DATE_B = "1996-01-01", "1996-12-31"


def _rev() -> Column:
    """Per-row revenue in IEEE double — identical in Spark and DuckDB."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"
# exact money-sum fragments (see functions/exact.py)
_SUMX_PRICE = oracle_sum_exact("o_totalprice")
_SUMX_REV = oracle_sum_exact(_REV_SQL)
_SUMM_PRICE = oracle_sum_micros("o_totalprice")
_SUMM_REV = oracle_sum_micros(_REV_SQL)


def _d2s(col: str, alias: str) -> Column:
    """date → 'YYYY-MM-DD' string at the output edge."""
    return F.date_format(F.col(col), "yyyy-MM-dd").alias(alias)


def _orders_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders with a DATE-typed column, like the reference's
    CAST(x.date AS DATE) idiom (earnings.py:76)."""
    return load_table(spark, sf_dir, "orders").withColumn(
        "o_date", F.to_date("o_orderdate")
    )


def _lineitem_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").withColumn(
        "l_date", F.to_date("l_shipdate")
    )


# ---------------------------------------------------------------------------
# flagship: earnings_by_day
# ---------------------------------------------------------------------------


def q_earnings_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (reference queries/earnings_by_day.sql:1-11): fact ⋈ dim
    with date-range + dimension predicates, daily SUM, ordered by day.

    Operators: J2 inner dim join (broadcast), P4 date-range, P8 conjunctive
    filter, P3 aliasing, A1 grouped sum, O1 order by.
    Mapping: orders≈performance fact, customer≈users, nation.n_name≈city.
    """
    orders = _orders_dated(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = F.broadcast(
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        orders.filter(F.col("o_date").between(F.lit(DATE_A), F.lit(DATE_B)))
        .join(dim, orders.o_custkey == dim.c_custkey, "inner")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .groupBy(_d2s("o_date", "report_date"))
        .agg(sum_exact("o_totalprice").alias("total_amount"))
        .orderBy("report_date")
    )


ORACLE_EARNINGS_BY_DAY = f"""
SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS report_date,
       {_SUMX_PRICE} AS total_amount
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# projections / filters
# ---------------------------------------------------------------------------


def q_proj_filter_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 projection + P2 computed column + P3 alias + P8 conjunctive filter
    (reference silver_ingest_streamate_mock.py:90, bronze_ingest_streamate_mock.py:36).
    Row-level output — no aggregation — so per-row arithmetic must match."""
    li = _lineitem_dated(spark, sf_dir)
    return (
        li.filter(
            (F.col("l_date").between("1996-03-01", "1996-03-31"))
            & (F.col("l_quantity") > 45)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").cast("long").alias("line_number"),
            _d2s("l_date", "ship_date"),
            _rev().alias("revenue"),
            F.lit("r1-batch").alias("processing_tag"),
        )
        .orderBy("order_key", "line_number")
    )


ORACLE_PROJ_FILTER = """
SELECT l_orderkey AS order_key,
       CAST(l_linenumber AS BIGINT) AS line_number,
       STRFTIME(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
       l_extendedprice * (1 - l_discount) AS revenue,
       'r1-batch' AS processing_tag
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'
  AND l_quantity > 45 AND l_returnflag = 'R'
ORDER BY 1, 2
"""


def q_or_filter_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 dynamic OR-of-equalities (reference earnings.py:51-66): request
    params become an OR-joined Column expression — no string SQL, so the
    reference's quote-escaping (P9, earnings.py:56-63) is obviated."""
    segments = ["BUILDING", "MACHINERY"]  # «locations» param
    nations = [3, 7]  # «user_selected» param
    customer = load_table(spark, sf_dir, "customer")
    ors = reduce(
        or_,
        [F.col("c_mktsegment") == s for s in segments]
        + [F.col("c_nationkey") == n for n in nations],
    )
    return (
        customer.filter(ors & (F.col("c_acctbal") > 0))
        .select(
            "c_custkey",
            "c_name",
            F.col("c_nationkey").cast("long").alias("nation_key"),
            "c_mktsegment",
            "c_acctbal",
        )
        .orderBy("c_custkey")
    )


ORACLE_OR_FILTER = """
SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS nation_key,
       c_mktsegment, c_acctbal
FROM customer
WHERE (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY'
       OR c_nationkey = 3 OR c_nationkey = 7)
  AND c_acctbal > 0
ORDER BY 1
"""


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 point lookup on (id, seq) — the upsert dedup probe
    (reference ingestStreamateModelPerformance.py:80-84)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_orderkey") == 1) & (F.col("l_linenumber") == 1)).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_quantity",
        "l_extendedprice",
    )


ORACLE_POINT_LOOKUP = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_quantity, l_extendedprice
FROM lineitem WHERE l_orderkey = 1 AND l_linenumber = 1
"""


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


def q_left_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left-outer equi-join (reference silver_ingest_streamate_mock.py:89-90:
    performer earnings ⟕ users). Grouped to keep the check compact; the
    null group proves the left-outer semantics."""
    orders = _orders_dated(spark, sf_dir)
    # drop some customers to force unmatched left rows
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 0)
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left_outer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_exact("o_totalprice").alias("total_amount"),
        )
        .orderBy(F.col("segment").asc_nulls_first())
    )


ORACLE_LEFT_JOIN = f"""
SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
       {_SUMX_PRICE} AS total_amount
FROM orders
LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 10 != 0) c
  ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1 NULLS FIRST
"""


def q_or_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 disjunctive OR-equi-join (reference profitAvg.py:84-85:
    ``emailaddress = streamateuser OR emailaddress = jasminuser``).

    Spark-first rewrite: a raw OR join degenerates to broadcast-nested-loop;
    at 100 TB the right plan is TWO hash joins UNIONed, deduped on the pair
    identity (rows matching both predicates must appear once). Both sides
    stay broadcastable/shuffle-friendly.
    """
    orders = _orders_dated(spark, sf_dir).filter(
        F.col("o_date").between("1996-01-01", "1996-01-31")
    )
    customer = load_table(spark, sf_dir, "customer")
    j1 = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    j2 = orders.join(F.broadcast(customer), orders.o_orderkey == customer.c_custkey)
    cols = ["o_orderkey", "c_custkey", "o_totalprice", "c_mktsegment"]
    pairs = j1.select(*cols).unionByName(j2.select(*cols)).distinct()
    return (
        pairs.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            sum_exact("o_totalprice").alias("total_amount"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_OR_KEY_JOIN = f"""
WITH pairs AS (
  SELECT DISTINCT o_orderkey, c_custkey, o_totalprice, c_mktsegment
  FROM orders JOIN customer
    ON (o_custkey = c_custkey OR o_orderkey = c_custkey)
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-01-31'
)
SELECT c_mktsegment, COUNT(*) AS n_pairs,
       {_SUMX_PRICE} AS total_amount
FROM pairs GROUP BY 1 ORDER BY 1
"""


def q_full_outer_platforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 full-outer of per-entity aggregates + COALESCE'd keys (reference
    detailedRanking.py:123-137: jasmin per-model sums ⟗ streamate per-model
    sums). Platforms ≈ l_linestatus 'O'/'F' splits of lineitem."""
    li = _lineitem_dated(spark, sf_dir).filter(
        F.col("l_date").between("1996-01-01", "1996-06-30")
    )

    def side(flag: str, label: str) -> DataFrame:
        return (
            li.filter(F.col("l_linestatus") == flag)
            .groupBy("l_suppkey")
            .agg(
                sum_exact(_rev()).alias(f"{label}_sales"),
                F.sum("l_quantity").alias(f"{label}_qty"),
            )
        )

    o, f_ = side("O", "open"), side("F", "finished")
    joined = o.join(f_, "l_suppkey", "full_outer")
    return joined.select(
        F.col("l_suppkey").alias("supp_key"),
        F.coalesce("open_sales", F.lit(0.0)).alias("open_sales"),
        F.coalesce("finished_sales", F.lit(0.0)).alias("finished_sales"),
        F.coalesce("open_qty", F.lit(0.0)).alias("open_qty"),
        F.coalesce("finished_qty", F.lit(0.0)).alias("finished_qty"),
    ).orderBy("supp_key")


ORACLE_FULL_OUTER = f"""
WITH li AS (SELECT * FROM lineitem
            WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
o AS (SELECT l_suppkey, {_SUMX_REV} AS open_sales,
             SUM(l_quantity) AS open_qty
      FROM li WHERE l_linestatus = 'O' GROUP BY 1),
f AS (SELECT l_suppkey, {_SUMX_REV} AS finished_sales,
             SUM(l_quantity) AS finished_qty
      FROM li WHERE l_linestatus = 'F' GROUP BY 1)
SELECT COALESCE(o.l_suppkey, f.l_suppkey) AS supp_key,
       COALESCE(open_sales, 0) AS open_sales,
       COALESCE(finished_sales, 0) AS finished_sales,
       COALESCE(open_qty, 0) AS open_qty,
       COALESCE(finished_qty, 0) AS finished_qty
FROM o FULL OUTER JOIN f ON o.l_suppkey = f.l_suppkey
ORDER BY 1
"""


def q_literal_dim_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 literal-dim driver + U2 inline VALUES + A10 COALESCE'd aggregate
    (reference totalProfitReport.py:81-97: 3-row dim LEFT JOIN aggregated
    subquery guarantees one row per category even when empty)."""
    from data_lake_spark.functions.localframe import values_df

    base = values_df(
        spark, [("O",), ("F",), ("Total",)], "category string"
    )
    li = _lineitem_dated(spark, sf_dir).filter(
        F.col("l_date").between("1997-01-01", "1997-03-31")
    )
    by_status = li.groupBy(F.col("l_linestatus").alias("category")).agg(
        sum_micros(_rev()).alias("rev_m")
    )
    total = li.agg(sum_micros(_rev()).alias("rev_m")).select(
        F.lit("Total").alias("category"), "rev_m"
    )
    agg = by_status.unionByName(total)
    # hint on the RIGHT side: Spark can't build-left a left-outer join,
    # so a broadcast hint on the preserved side is silently dropped
    return (
        base.join(F.broadcast(agg), "category", "left")
        .select(
            "category",
            micros_to_amount(F.coalesce(F.col("rev_m"), F.lit(0))).alias(
                "total_revenue"
            ),
        )
        .orderBy(
            F.when(F.col("category") == "Total", 1)
            .when(F.col("category") == "F", 2)
            .otherwise(3)
        )
    )


ORACLE_LITERAL_DIM = f"""
WITH base AS (SELECT 'O' AS category UNION ALL SELECT 'F' UNION ALL SELECT 'Total'),
li AS (SELECT l_linestatus, {_REV_SQL} AS rev FROM lineitem
       WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'),
by_status AS (SELECT l_linestatus AS category, {oracle_sum_micros('rev')} AS rev_m
              FROM li GROUP BY 1),
tot AS (SELECT 'Total' AS category, {oracle_sum_micros('rev')} AS rev_m FROM li),
agg AS (SELECT * FROM by_status UNION ALL SELECT * FROM tot)
SELECT b.category,
       CAST(COALESCE(a.rev_m, 0) AS DOUBLE) / 1000000.0 AS total_revenue
FROM base b LEFT JOIN agg a USING (category)
ORDER BY CASE b.category WHEN 'Total' THEN 1 WHEN 'F' THEN 2 ELSE 3 END
"""


# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------


def q_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 global no-group SUM over a filtered range (reference needle.py:92-103)."""
    li = _lineitem_dated(spark, sf_dir)
    return li.filter(F.col("l_date").between(DATE_A, DATE_B)).agg(
        sum_exact(_rev()).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_GLOBAL_SUM = f"""
SELECT {_SUMX_REV} AS total_revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
"""


def q_weekly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 multi-key calendar aggregation (reference README.md:46-66,
    src/Athena/weekly_earnings.sql:1-6: group by nickname, YEAR, WEEK).
    Presto WEEK == ISO week == Spark weekofyear (§2.9 parity note)."""
    li = _lineitem_dated(spark, sf_dir)
    return (
        li.filter(F.col("l_date").between("1996-01-08", "1996-06-30"))
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.year("l_date").cast("long").alias("y"),
            week_presto("l_date").alias("w"),
        )
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            sum_exact(_rev()).alias("total_revenue"),
        )
        .orderBy("flag", "y", "w")
    )


ORACLE_WEEKLY_AGG = f"""
SELECT l_returnflag AS flag,
       CAST(YEAR(CAST(l_shipdate AS DATE)) AS BIGINT) AS y,
       CAST(WEEKOFYEAR(CAST(l_shipdate AS DATE)) AS BIGINT) AS w,
       SUM(l_quantity) AS total_qty,
       {_SUMX_REV} AS total_revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-08' AND DATE '1996-06-30'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_multi_agg_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 grouped multi-aggregate with MAX() attr collapse (reference
    detailedRanking.py:88-121: SUM(earnings), SUM(seconds), MAX(picture)…)."""
    orders = _orders_dated(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_date").between(DATE_A, DATE_B))
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_custkey").alias("model_id"))
        .agg(
            sum_exact("o_totalprice").alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
            F.max("c_name").alias("name"),
            F.max("c_mktsegment").alias("segment"),
        )
        .orderBy("model_id")
    )


ORACLE_MULTI_AGG = f"""
SELECT c_custkey AS model_id,
       {_SUMX_PRICE} AS total_sales,
       COUNT(*) AS n_orders,
       MAX(c_name) AS name, MAX(c_mktsegment) AS segment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
GROUP BY 1 ORDER BY 1
"""


def q_avg_of_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 two-level aggregate: per-period sums then AVG across periods
    (reference needle.py:104-136), with A9's bucketed period key.
    Inner sums stay in exact micros; the outer AVG divides once in double."""
    li = _lineitem_dated(spark, sf_dir)
    monthly = (
        li.filter(F.col("l_date").between("1996-01-01", "1997-12-31"))
        .groupBy(
            F.year("l_date").cast("long").alias("y"),
            F.month("l_date").cast("long").alias("m"),
        )
        .agg(sum_micros(_rev()).alias("s"))
    )
    return monthly.agg(
        (micros_to_amount(F.sum("s")) / F.count("s")).alias("avg_monthly_revenue"),
        F.count("s").alias("n_periods"),
    )


ORACLE_AVG_OF_SUMS = f"""
WITH monthly AS (
  SELECT CAST(YEAR(CAST(l_shipdate AS DATE)) AS BIGINT) AS y,
         CAST(MONTH(CAST(l_shipdate AS DATE)) AS BIGINT) AS m,
         {_SUMM_REV} AS s
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
  GROUP BY 1, 2
)
SELECT CAST(SUM(s) AS DOUBLE) / 1000000.0 / COUNT(s) AS avg_monthly_revenue,
       COUNT(s) AS n_periods
FROM monthly
"""


def q_dow_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 COUNT(DISTINCT date) + A8 percentage-of-total + A9 GROUP BY
    expression + the Presto day_of_week parity shift (reference
    earningsByDayOfWeek.py:123-152; §2.9 off-by-one note).

    Percentage-of-total is a constant-partition window SUM over the
    grouped frame — the frame is bounded at 7 rows BY CONSTRUCTION
    (grouping key = day-of-week), so the single window partition can
    never become a reducer bottleneck at any data volume, and the whole
    query stays one pass (no checkpoint, no scalar cross join).
    """
    orders = _orders_dated(spark, sf_dir)
    grouped = (
        orders.filter(F.col("o_date").between(DATE_A, DATE_B))
        .groupBy(dow_presto("o_date").alias("dow_iso"))
        .agg(
            sum_micros("o_totalprice").alias("s_m"),
            F.countDistinct("o_date").alias("active_days"),
        )
    )
    w = Window.partitionBy(F.lit(0))
    amt = micros_to_amount(F.col("s_m"))
    return (
        grouped.select(
            "dow_iso",
            amt.alias("total_amount"),
            "active_days",
            (amt / F.col("active_days")).alias("avg_per_active_day"),
            (amt * 100 / micros_to_amount(F.sum("s_m").over(w))).alias("pct_of_total"),
        )
        .orderBy("dow_iso")
    )


ORACLE_DOW_DISTRIBUTION = f"""
WITH grouped AS (
  SELECT CAST(ISODOW(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow_iso,
         {_SUMM_PRICE} AS s_m,
         COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS active_days
  FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
  GROUP BY 1
)
SELECT dow_iso,
       CAST(s_m AS DOUBLE) / 1000000.0 AS total_amount,
       active_days,
       CAST(s_m AS DOUBLE) / 1000000.0 / active_days AS avg_per_active_day,
       CAST(s_m AS DOUBLE) / 1000000.0 * 100
         / (CAST(SUM(s_m) OVER () AS DOUBLE) / 1000000.0) AS pct_of_total
FROM grouped ORDER BY 1
"""


def q_ratio_profitability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 ratio-of-aggregates: earnings per hour (reference
    averageProfitability.py:94: SUM(earnings)/(SUM(seconds)/3600)), with
    A10's COALESCE-in-SUM. l_quantity plays online_seconds (integral →
    plain double SUM is already exact)."""
    li = _lineitem_dated(spark, sf_dir)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_date").between(DATE_A, DATE_B))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            sum_micros(F.coalesce(_rev(), F.lit(0.0))).alias("rev_m"),
            F.sum("l_quantity").alias("qty"),
        )
        .select(
            "nation",
            micros_to_amount(F.col("rev_m")).alias("total_revenue"),
            (micros_to_amount(F.col("rev_m")) / (F.col("qty") / 3600.0)).alias(
                "revenue_per_hour"
            ),
        )
        .orderBy("nation")
    )


ORACLE_RATIO = f"""
WITH grouped AS (
  SELECT n_name AS nation,
         {oracle_sum_micros(f'COALESCE({_REV_SQL}, 0.0)')} AS rev_m,
         SUM(l_quantity) AS qty
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
  GROUP BY 1
)
SELECT nation,
       CAST(rev_m AS DOUBLE) / 1000000.0 AS total_revenue,
       CAST(rev_m AS DOUBLE) / 1000000.0 / (qty / 3600.0) AS revenue_per_hour
FROM grouped ORDER BY 1
"""


# ---------------------------------------------------------------------------
# window / ranking / top-k
# ---------------------------------------------------------------------------


def q_rank_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 the reference's only window fn: ROW_NUMBER() over global ORDER BY
    aggregated earnings (models_earning_distribution.py:100), plus O3
    multi-key sort. Ranked with the two-phase distributed ROW_NUMBER
    (operators/ranking.py): range-repartition on the sort keys, rank
    locally, add broadcast per-partition offsets — no single-reducer
    window even when the artist dimension grows 100×. Ranking on exact
    micros (long) with the artist tie-break makes the order total, so the
    two-phase ranks are bit-identical to the global window's."""
    orders = _orders_dated(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    per_model = (
        orders.filter(F.col("o_date").between(DATE_A, DATE_B))
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_name").alias("artist"))
        .agg(sum_micros("o_totalprice").alias("s_m"))
    )
    ranked = global_row_number(
        per_model, [F.col("s_m").desc(), F.col("artist").asc()], "ranking"
    )
    return (
        ranked.select(
            "ranking", "artist", micros_to_amount(F.col("s_m")).alias("total_earnings")
        )
        .orderBy("ranking")
    )


ORACLE_RANK_MODELS = f"""
WITH per_model AS (
  SELECT c_name AS artist, {_SUMM_PRICE} AS s_m
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
  GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY s_m DESC, artist ASC) AS BIGINT) AS ranking,
       artist, CAST(s_m AS DOUBLE) / 1000000.0 AS total_earnings
FROM per_model ORDER BY 1
"""


def q_top5_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 + O4: keep top-5 by rank, remap the tail to 'General', re-group
    (reference models_earning_distribution.py:117-137), with A8
    percentage-of-total on the re-grouped result. Micros stay exact through
    BOTH aggregation levels. Top-5 membership comes from a
    TakeOrderedAndProject (operators/ranking.top_k) broadcast back against
    the aggregate — no global window; per_model is checkpointed once so
    the membership probe doesn't recompute the fact aggregation. The
    percentage denominator is a broadcast scalar aggregate for the same
    reason."""
    orders = _orders_dated(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    per_model = (
        orders.filter(F.col("o_date").between(DATE_A, DATE_B))
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_name").alias("artist"))
        .agg(sum_micros("o_totalprice").alias("s_m"))
        .localCheckpoint(eager=False)
    )
    top5 = top_k(
        per_model, [F.col("s_m").desc(), F.col("artist").asc()], 5
    ).select("artist", F.lit(True).alias("_top"))
    relabeled = per_model.join(F.broadcast(top5), "artist", "left").select(
        F.when(F.col("_top"), F.col("artist")).otherwise("General").alias("artist"),
        "s_m",
    )
    regrouped = relabeled.groupBy("artist").agg(F.sum("s_m").alias("s2_m"))
    total = regrouped.agg(F.sum("s2_m").alias("_tot_m"))
    amt = micros_to_amount(F.col("s2_m"))
    return (
        with_broadcast_scalar(regrouped, total)
        .select(
            "artist",
            amt.alias("total_earnings"),
            (amt * 100 / micros_to_amount(F.col("_tot_m"))).alias("pct_of_total"),
        )
        .orderBy(F.col("total_earnings").desc(), F.col("artist"))
    )


ORACLE_TOP5 = f"""
WITH per_model AS (
  SELECT c_name AS artist, {_SUMM_PRICE} AS s_m
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
  GROUP BY 1
),
ranked AS (
  SELECT artist, s_m, ROW_NUMBER() OVER (ORDER BY s_m DESC, artist ASC) AS rk
  FROM per_model
),
regrouped AS (
  SELECT CASE WHEN rk <= 5 THEN artist ELSE 'General' END AS artist,
         SUM(s_m) AS s2_m
  FROM ranked GROUP BY 1
)
SELECT artist, CAST(s2_m AS DOUBLE) / 1000000.0 AS total_earnings,
       CAST(s2_m AS DOUBLE) / 1000000.0 * 100
         / (CAST(SUM(s2_m) OVER () AS DOUBLE) / 1000000.0) AS pct_of_total
FROM regrouped ORDER BY 2 DESC, 1
"""


def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 pagination done IN the engine (reference detailedRanking.py:223-235
    slices collected rows client-side — the anti-pattern; Spark ≥3.4 has
    offset/limit on a deterministic sort) + O6 post-agg HAVING filter
    (detailedRanking.py:220-221)."""
    li = _lineitem_dated(spark, sf_dir).filter(
        F.col("l_date").between("1996-01-01", "1996-06-30")
    )
    per_supp = (
        li.groupBy(F.col("l_suppkey").alias("supp_key"))
        .agg(
            sum_micros(_rev()).alias("s_m"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .filter(F.col("s_m") > 0)  # HAVING
    )
    page, limit = 2, 10
    return (
        per_supp.select(
            "supp_key",
            micros_to_amount(F.col("s_m")).alias("total_sales"),
            "total_qty",
        )
        .orderBy(F.col("total_sales").desc(), F.col("supp_key").asc())
        .offset((page - 1) * limit)
        .limit(limit)
    )


ORACLE_PAGINATION = f"""
WITH per_supp AS (
  SELECT l_suppkey AS supp_key,
         {_SUMM_REV} AS s_m,
         SUM(l_quantity) AS total_qty
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
  GROUP BY 1
  HAVING {_SUMM_REV} > 0
)
SELECT supp_key, CAST(s_m AS DOUBLE) / 1000000.0 AS total_sales, total_qty
FROM per_supp
ORDER BY 2 DESC, 1 ASC
LIMIT 10 OFFSET 10
"""


# ---------------------------------------------------------------------------
# set ops / union platforms / pivot series
# ---------------------------------------------------------------------------


def q_earnings_series_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 UNION ALL of two platform facts + the §2.13 pivot-to-series
    post-processing folded into the engine (reference earnings.py:93-114
    union; earnings.py:162-213 per-platform date series with null-fill).
    Platforms ≈ o_orderpriority '1-URGENT' (jasmin) vs '5-LOW' (streamate)."""
    orders = _orders_dated(spark, sf_dir).filter(
        F.col("o_date").between("1996-01-01", "1996-03-31")
    )
    jasmin = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_date", "o_totalprice", F.lit("jasmin").alias("source")
    )
    streamate = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_date", "o_totalprice", F.lit("streamate").alias("source")
    )
    both = jasmin.unionByName(streamate)
    pivoted = (
        both.groupBy(_d2s("o_date", "report_date"))
        .pivot("source", ["jasmin", "streamate"])
        .agg(sum_micros("o_totalprice"))
    )
    return pivoted.select(
        "report_date",
        micros_to_amount(F.coalesce(F.col("jasmin"), F.lit(0))).alias("jasmin"),
        micros_to_amount(F.coalesce(F.col("streamate"), F.lit(0))).alias("streamate"),
    ).orderBy("report_date")


ORACLE_SERIES_PIVOT = f"""
WITH both_src AS (
  SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS report_date,
         o_totalprice, 'jasmin' AS source
  FROM orders WHERE o_orderpriority = '1-URGENT'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
  UNION ALL
  SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS report_date,
         o_totalprice, 'streamate' AS source
  FROM orders WHERE o_orderpriority = '5-LOW'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
)
SELECT report_date,
       CAST(COALESCE(SUM(CASE WHEN source = 'jasmin'
                              THEN CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)
                         END), 0) AS DOUBLE) / 1000000.0 AS jasmin,
       CAST(COALESCE(SUM(CASE WHEN source = 'streamate'
                              THEN CAST(FLOOR(o_totalprice * 1000000.0) AS BIGINT)
                         END), 0) AS DOUBLE) / 1000000.0 AS streamate
FROM both_src GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# dedup / scalar parity / nested / json
# ---------------------------------------------------------------------------


def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/A12/D4 keep-latest-per-key dedup, the scale-safe form of
    ``dropDuplicates([keys])`` (reference bronze_ingest_streamate_mock.py:42-48,
    BronzeIngestUsers.py:69-77): window row_number over (key ORDER BY
    recency, unique tiebreak) — deterministic on any cluster. events.ts is
    long nanos here (catalog._normalize) — ordering is identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("user_id", "event_type")
    )


ORACLE_DEDUP_LATEST = """
SELECT event_id, user_id, event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id, event_type
"""


def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 date-function parity surface: YEAR/MONTH/WEEK/day_of_week/
    QUARTER/EXTRACT over every distinct date (reference needle.py:113-129,
    earningsByDayOfWeek.py:123, README.md:48-66). The dow_iso column is the
    Presto↔Spark off-by-one trap, tested date-by-date."""
    orders = _orders_dated(spark, sf_dir)
    return (
        orders.select(F.col("o_date").alias("d"))
        .distinct()
        .select(
            _d2s("d", "d"),
            F.year("d").cast("long").alias("y"),
            F.quarter("d").cast("long").alias("q"),
            F.month("d").cast("long").alias("m"),
            week_presto("d").alias("wk"),
            dow_presto("d").alias("dow_iso"),
            F.dayofmonth("d").cast("long").alias("dom"),
        )
        .orderBy("d")
    )


ORACLE_DATE_PARTS = """
SELECT STRFTIME(d, '%Y-%m-%d') AS d,
       CAST(YEAR(d) AS BIGINT) AS y, CAST(QUARTER(d) AS BIGINT) AS q,
       CAST(MONTH(d) AS BIGINT) AS m, CAST(WEEKOFYEAR(d) AS BIGINT) AS wk,
       CAST(ISODOW(d) AS BIGINT) AS dow_iso, CAST(DAYOFMONTH(d) AS BIGINT) AS dom
FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
ORDER BY 1
"""


def q_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 triple-nested flatten via explode — replaces the reference's
    collect()-to-driver loop (silver_ingest_streamate_mock.py:46-86, the
    anti-pattern SURVEY §4 flags). We first BUILD the nested shape
    (orders→array<struct<lineitem>>, like studios→performers→earnings) then
    flatten it back with explode and aggregate; the oracle is the direct
    relational equivalent, proving explode loses nothing."""
    li = _lineitem_dated(spark, sf_dir).filter(
        F.col("l_date").between("1996-01-01", "1996-01-31")
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("line"),
                    F.col("l_quantity").alias("qty"),
                    _rev().alias("rev"),
                    F.col("l_returnflag").alias("flag"),
                )
            )
        ).alias("items")
    )
    flat = nested.select("l_orderkey", F.explode("items").alias("it")).select(
        "l_orderkey", "it.line", "it.qty", "it.rev", "it.flag"
    )
    return (
        flat.groupBy(F.col("flag"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").alias("total_qty"),
            sum_exact("rev").alias("total_revenue"),
        )
        .orderBy("flag")
    )


ORACLE_NESTED_FLATTEN = f"""
SELECT l_returnflag AS flag, COUNT(*) AS n_items, SUM(l_quantity) AS total_qty,
       {_SUMX_REV} AS total_revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-01-31'
GROUP BY 1 ORDER BY 1
"""


def q_json_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-adjacent: JSON payload parsing pushed into the engine (reference
    bronze_ingest_streamate_mock.py:28-33 parses an API JSON payload).
    events.props is a JSON string column → typed extraction + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


ORACLE_JSON_PAYLOAD = """
SELECT event_type,
       CAST(SUM(CAST(REGEXP_EXTRACT(props, '[0-9]+', 0) AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""



def q_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass: year → month → grand total via
    ROLLUP (the subtotal family the reference assembles with separate
    UNION ALL queries, e.g. totalProfitReport.py:81-97's literal-dim +
    per-category subqueries — here it's one shuffle with partial aggs).
    Keys are coalesced to 'ALL' in both engines so no nullable-int dtype
    ambiguity reaches the compare."""
    orders = _orders_dated(spark, sf_dir)
    return (
        orders.rollup(
            F.year("o_date").cast("string").alias("y"),
            F.month("o_date").cast("string").alias("m"),
        )
        .agg(
            sum_exact("o_totalprice").alias("total_amount"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("y", F.lit("ALL")).alias("year_key"),
            F.coalesce("m", F.lit("ALL")).alias("month_key"),
            "total_amount",
            "n_orders",
        )
        .orderBy("year_key", "month_key")
    )


ORACLE_ROLLUP_REPORT = f"""
SELECT COALESCE(CAST(YEAR(CAST(o_orderdate AS DATE)) AS VARCHAR), 'ALL') AS year_key,
       COALESCE(CAST(MONTH(CAST(o_orderdate AS DATE)) AS VARCHAR), 'ALL') AS month_key,
       {_SUMX_PRICE} AS total_amount,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP(YEAR(CAST(o_orderdate AS DATE)), MONTH(CAST(o_orderdate AS DATE)))
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

REGISTRY: dict[str, QuerySpec] = {
    "earnings_by_day": QuerySpec(q_earnings_by_day, ORACLE_EARNINGS_BY_DAY, "flagship J2+P4+P8+A1+O1"),
    "proj_filter_compute": QuerySpec(q_proj_filter_compute, ORACLE_PROJ_FILTER, "P1+P2+P3+P8"),
    "or_filter_dim": QuerySpec(q_or_filter_dim, ORACLE_OR_FILTER, "P6 dynamic OR filters"),
    "point_lookup": QuerySpec(q_point_lookup, ORACLE_POINT_LOOKUP, "P7"),
    "left_join_dim": QuerySpec(q_left_join_dim, ORACLE_LEFT_JOIN, "J1 left outer"),
    "or_key_join": QuerySpec(q_or_key_join, ORACLE_OR_KEY_JOIN, "J4 disjunctive join via union rewrite"),
    "full_outer_platforms": QuerySpec(q_full_outer_platforms, ORACLE_FULL_OUTER, "J5 full outer + coalesce"),
    "literal_dim_report": QuerySpec(q_literal_dim_report, ORACLE_LITERAL_DIM, "J6+U2+A10"),
    "global_sum": QuerySpec(q_global_sum, ORACLE_GLOBAL_SUM, "A4"),
    "weekly_agg": QuerySpec(q_weekly_agg, ORACLE_WEEKLY_AGG, "A2 calendar keys"),
    "multi_agg_attrs": QuerySpec(q_multi_agg_attrs, ORACLE_MULTI_AGG, "A3 sum+count+max"),
    "avg_of_sums": QuerySpec(q_avg_of_sums, ORACLE_AVG_OF_SUMS, "A5 two-level"),
    "dow_distribution": QuerySpec(q_dow_distribution, ORACLE_DOW_DISTRIBUTION, "A6+A8+A9+dow parity"),
    "ratio_profitability": QuerySpec(q_ratio_profitability, ORACLE_RATIO, "A7+A10"),
    "rank_models": QuerySpec(q_rank_models, ORACLE_RANK_MODELS, "W1+O3"),
    "top5_distribution": QuerySpec(q_top5_distribution, ORACLE_TOP5, "A11+O4+A8"),
    "pagination": QuerySpec(q_pagination, ORACLE_PAGINATION, "O5+O6"),
    "earnings_series_pivot": QuerySpec(q_earnings_series_pivot, ORACLE_SERIES_PIVOT, "U1 + §2.13 pivot"),
    "dedup_keep_latest": QuerySpec(q_dedup_keep_latest, ORACLE_DEDUP_LATEST, "D1/D4 keep-latest"),
    "date_parts": QuerySpec(q_date_parts, ORACLE_DATE_PARTS, "§2.9 parity"),
    "nested_flatten": QuerySpec(q_nested_flatten, ORACLE_NESTED_FLATTEN, "N1 explode"),
    "json_payload": QuerySpec(q_json_payload, ORACLE_JSON_PAYLOAD, "S1 JSON parse"),
    "rollup_report": QuerySpec(q_rollup_report, ORACLE_ROLLUP_REPORT, "ROLLUP year/month/grand subtotals"),
}
