"""Skew-mitigation queries: the salted join as a driver-checked query.

The point being proven: ``operators.partitioning.salted_join`` is
RESULT-equivalent to the plain equi-join — the oracle is the plain SQL
join — while physically spreading each hot key over ``n_salts`` shuffle
partitions. At 100 TB the salt is what keeps one hot user/device/page
key from pinning an entire reducer; here the driver verifies it changes
nothing about the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact
from data_lake_spark.operators.partitioning import salted_join
from data_lake_spark.queries import QuerySpec


def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value by customer market segment through an 8-way salted
    join: events (the big, potentially hot-keyed side) spread across
    salts, the customer dim replicated per salt, joined on
    (key, salt) — bit-identical totals to the unsalted join because the
    sum is the exact associative micros sum."""
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    big = events.select(
        F.col("user_id").alias("c_custkey"), "event_type", "value"
    )
    small = cust.select("c_custkey", "c_mktsegment")
    j = salted_join(big, small, "c_custkey", n_salts=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_exact("value").alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_SALTED_JOIN_AGG = f"""
SELECT c.c_mktsegment, COUNT(*) AS n_events,
       {oracle_sum_exact('e.value')} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


REGISTRY: dict[str, QuerySpec] = {
    "salted_join_agg": QuerySpec(
        q_salted_join_agg,
        ORACLE_SALTED_JOIN_AGG,
        "8-way salted skew join, result-equivalent to the plain join",
    ),
}
