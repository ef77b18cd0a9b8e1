"""Relational completeness extensions: CUBE, semi/anti joins, INTERSECT /
EXCEPT, and scalar string-function parity.

The reference never uses these (SURVEY §2.3 note: no semi/anti joins;
§2.7: no INTERSECT/EXCEPT; §2.4 note: no cube), but a user switching
engines expects the full relational algebra to exist — and each has a
distinct physical shape worth locking in:

- semi/anti joins ship only the join key (no payload columns) and stop
  probing on first match — strictly cheaper than inner-join + distinct;
- CUBE expands grouping sets map-side before one shuffle, replacing 4
  separate queries;
- INTERSECT/EXCEPT hash on the full row — here they run over already
  key-projected inputs so the shuffle carries just the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact
from data_lake_spark.queries import QuerySpec
from data_lake_spark.queries.relational import (
    DATE_A,
    DATE_B,
    _lineitem_dated,
    _orders_dated,
)

_SUMX_PRICE = oracle_sum_exact("o_totalprice")


# ---------------------------------------------------------------------------
# cube_report — all four grouping sets in one shuffle
# ---------------------------------------------------------------------------


def q_cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): per-cell, per-flag, per-status,
    and grand totals in a single pass — the generalization of
    rollup_report. Partial aggregation happens before the one shuffle, so
    the cube costs ~4 map-side rows per input group, not 4 table scans."""
    li = _lineitem_dated(spark, sf_dir)
    return (
        li.filter(F.col("l_date").between(DATE_A, DATE_B))
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "total_qty",
            "n_items",
        )
        .orderBy("flag", "status")
    )


ORACLE_CUBE_REPORT = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       SUM(l_quantity) AS total_qty,
       COUNT(*) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# semi / anti joins — existence tests that ship only the key
# ---------------------------------------------------------------------------


def q_semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one 1996 order, via LEFT SEMI join — the
    EXISTS shape. The build side is just o_custkey (distinct-on-probe is
    implicit), no order payload crosses the shuffle, and each probe stops
    at the first match."""
    orders = _orders_dated(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    active = orders.filter(F.col("o_date").between(DATE_A, DATE_B)).select(
        "o_custkey"
    )
    return (
        cust.join(active, cust.c_custkey == active.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ORACLE_SEMI_JOIN = f"""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
)
ORDER BY c_custkey
"""


def q_anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO 1996 order (LEFT ANTI = NOT EXISTS), rolled up to
    a count per market segment — the churn/orphan-detection query shape."""
    orders = _orders_dated(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    active = orders.filter(F.col("o_date").between(DATE_A, DATE_B)).select(
        "o_custkey"
    )
    return (
        cust.join(active, cust.c_custkey == active.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("segment")
    )


ORACLE_ANTI_JOIN = f"""
SELECT c_mktsegment AS segment, COUNT(*) AS n_inactive
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '{DATE_B}'
)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# set_ops — INTERSECT / EXCEPT over key-projected inputs
# ---------------------------------------------------------------------------


def q_set_ops_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-key set algebra between 1996 H1 and H2 order activity:
    'both' = INTERSECT, 'h1_only' = EXCEPT. Inputs are projected to the
    bare key before the set op, so the shuffle carries 8 bytes/row; the
    two branches union into one labeled result."""
    orders = _orders_dated(spark, sf_dir)
    h1 = orders.filter(F.col("o_date").between(DATE_A, "1996-06-30")).select(
        "o_custkey"
    )
    h2 = orders.filter(F.col("o_date").between("1996-07-01", DATE_B)).select(
        "o_custkey"
    )
    both = h1.intersect(h2).select(
        F.lit("both").alias("bucket"), F.col("o_custkey").alias("custkey")
    )
    h1_only = h1.subtract(h2).select(
        F.lit("h1_only").alias("bucket"), F.col("o_custkey").alias("custkey")
    )
    return both.unionByName(h1_only).orderBy("bucket", "custkey")


ORACLE_SET_OPS = f"""
WITH h1 AS (
  SELECT o_custkey FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '{DATE_A}' AND DATE '1996-06-30'
),
h2 AS (
  SELECT o_custkey FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-07-01' AND DATE '{DATE_B}'
)
SELECT 'both' AS bucket, o_custkey AS custkey FROM (
  SELECT o_custkey FROM h1 INTERSECT SELECT o_custkey FROM h2
)
UNION ALL
SELECT 'h1_only' AS bucket, o_custkey AS custkey FROM (
  SELECT o_custkey FROM h1 EXCEPT SELECT o_custkey FROM h2
)
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# string_funcs — scalar string-function parity surface
# ---------------------------------------------------------------------------


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function parity over the customer dim: UPPER, LOWER,
    SUBSTR, REPLACE, TRIM, LPAD, LENGTH, concatenation, and LIKE filtering
    — the §2.9 scalar surface the reference leaves to Presto, shown
    engine-identical. Pure per-row projection: whole-stage codegen, no
    shuffle but the final sort."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_name").like("%7"))
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.substring("c_name", 10, 9).alias("name_digits"),
            F.regexp_replace(F.col("c_name"), "#0+", "#").alias("name_short"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
            F.length(F.trim(F.col("c_mktsegment"))).cast("long").alias("seg_len"),
            F.concat_ws("|", "c_name", "c_mktsegment").alias("tagged"),
        )
        .orderBy("c_custkey")
    )


ORACLE_STRING_FUNCS = """
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       LOWER(c_mktsegment) AS seg_lower,
       SUBSTR(c_name, 10, 9) AS name_digits,
       REGEXP_REPLACE(c_name, '#0+', '#', 'g') AS name_short,
       LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       CAST(LENGTH(TRIM(c_mktsegment)) AS BIGINT) AS seg_len,
       c_name || '|' || c_mktsegment AS tagged
FROM customer
WHERE c_name LIKE '%7'
ORDER BY c_custkey
"""


REGISTRY: dict[str, QuerySpec] = {
    "cube_report": QuerySpec(
        q_cube_report, ORACLE_CUBE_REPORT,
        "CUBE: 4 grouping sets in one shuffle",
    ),
    "semi_join_active": QuerySpec(
        q_semi_join_active, ORACLE_SEMI_JOIN,
        "LEFT SEMI join (EXISTS shape, key-only shuffle)",
    ),
    "anti_join_inactive": QuerySpec(
        q_anti_join_inactive, ORACLE_ANTI_JOIN,
        "LEFT ANTI join (NOT EXISTS / churn detection)",
    ),
    "set_ops_halves": QuerySpec(
        q_set_ops_halves, ORACLE_SET_OPS,
        "INTERSECT / EXCEPT over key-projected inputs",
    ),
    "string_funcs": QuerySpec(
        q_string_funcs, ORACLE_STRING_FUNCS,
        "scalar string-function parity (§2.9 surface)",
    ),
}
