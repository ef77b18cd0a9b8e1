"""Reference-domain adapters over the driver testdata.

The reference's serving layer runs over three tables (SURVEY §1.2):
``bronze_users`` (dim), ``silver_jasmin_model_performance`` /
``silver_streamate_model_performance`` (facts), plus
``silver_earnings_by_performer``. The driver testdata is TPC-H-ish, so
these adapters deterministically derive the reference-domain shapes from
``customer``/``nation``/``orders`` (FIXTURES.md §B mapping: platform split
by o_orderpriority). Each adapter has a DuckDB CTE mirror so endpoint
queries remain oracle-checkable end-to-end.

Note: ``total_earnings`` stays double here (the reference stores it
stringly and CASTs back — a lossless no-op we don't replicate in the
adapters because double→string formatting differs across engines; the
stringly path is exercised in the pytest fixtures instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table

JASMIN_PRIORITIES = ("1-URGENT", "2-HIGH")


def _s(col) -> F.Column:
    return col.cast("string")


def users_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bronze_users ≈ customer ⋈ nation (city=n_name, office=c_mktsegment)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ck = F.col("c_custkey")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        _s(ck).alias("_id"),
        F.col("c_name").alias("artisticname"),
        F.col("n_name").alias("city"),
        F.col("c_mktsegment").alias("office"),
        F.concat(F.lit("R"), _s(ck % 10)).alias("room"),
        F.concat(F.lit("pic_"), _s(ck)).alias("picture"),
        F.concat(F.lit("s"), _s(ck), F.lit("@x.com")).alias("streamateuser"),
        F.concat(F.lit("j"), _s(ck), F.lit("@x.com")).alias("jasminuser"),
    )


def _perf(spark: SparkSession, sf_dir: str, jasmin: bool) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cond = F.col("o_orderpriority").isin(*JASMIN_PRIORITIES)
    return o.filter(cond if jasmin else ~cond).select(
        _s(F.col("o_custkey")).alias("_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        F.col("o_totalprice").alias("total_earnings"),
        (F.col("o_orderkey") % 86400).cast("long").alias("online_seconds"),
    )


def jasmin_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """silver_jasmin_model_performance ≈ high-priority orders."""
    return _perf(spark, sf_dir, True)


def streamate_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """silver_streamate_model_performance ≈ the remaining orders."""
    return _perf(spark, sf_dir, False)


def earnings_by_performer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """silver_earnings_by_performer ≈ orders keyed by platform email."""
    o = load_table(spark, sf_dir, "orders")
    is_j = F.col("o_orderpriority").isin(*JASMIN_PRIORITIES)
    email = F.concat(
        F.when(is_j, "j").otherwise("s"), _s(F.col("o_custkey")), F.lit("@x.com")
    )
    return o.select(
        email.alias("emailaddress"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        F.col("o_totalprice").alias("payableamount"),
    )


# --- DuckDB CTE mirrors ----------------------------------------------------

_J_PRI = "('1-URGENT', '2-HIGH')"

ADAPTERS_SQL = f"""
users AS (
  SELECT CAST(c_custkey AS VARCHAR) AS _id,
         c_name AS artisticname,
         n_name AS city,
         c_mktsegment AS office,
         'R' || CAST(c_custkey % 10 AS VARCHAR) AS room,
         'pic_' || CAST(c_custkey AS VARCHAR) AS picture,
         's' || CAST(c_custkey AS VARCHAR) || '@x.com' AS streamateuser,
         'j' || CAST(c_custkey AS VARCHAR) || '@x.com' AS jasminuser
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
jasmin_perf AS (
  SELECT CAST(o_custkey AS VARCHAR) AS _id,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date,
         o_totalprice AS total_earnings,
         CAST(o_orderkey % 86400 AS BIGINT) AS online_seconds
  FROM orders WHERE o_orderpriority IN {_J_PRI}
),
streamate_perf AS (
  SELECT CAST(o_custkey AS VARCHAR) AS _id,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date,
         o_totalprice AS total_earnings,
         CAST(o_orderkey % 86400 AS BIGINT) AS online_seconds
  FROM orders WHERE o_orderpriority NOT IN {_J_PRI}
),
eap AS (
  SELECT CASE WHEN o_orderpriority IN {_J_PRI}
              THEN 'j' || CAST(o_custkey AS VARCHAR) || '@x.com'
              ELSE 's' || CAST(o_custkey AS VARCHAR) || '@x.com' END AS emailaddress,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date,
         o_totalprice AS payableamount
  FROM orders
)
"""
