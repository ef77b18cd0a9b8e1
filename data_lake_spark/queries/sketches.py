"""Approximate (sketch-based) aggregation queries — the operators that make
100 TB interactive: HyperLogLog++ distinct counts and t-digest-style
quantiles run in O(sketch) memory per group and merge associatively across
partitions, where their exact twins need a full shuffle of the distinct
values (or a sort).

These are deliberately NOT oracle-checked against DuckDB: the sketch
contents are engine-specific (Spark HLL++ / approx-percentile internals),
so cross-engine value equality is undefined. The driver records rows-only
checks; the accuracy contract lives in tests/test_sketches.py, which
bounds each sketch against its exact twin computed in the same engine
(HLL rsd 5%; quantile within the observed value range and monotone).

Each query also returns the exact value next to the sketch, so the result
itself documents the error — and the exact computation doubles as the
in-engine ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.queries import QuerySpec
from data_lake_spark.queries.temporal import _events_secs


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type: HLL++ sketch (rsd 2%) next to the
    exact count. At scale the sketch is a map-side-mergeable fixed-size
    state; the exact count re-shuffles every distinct (event_type,
    user_id) pair."""
    e = _events_secs(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value quantiles per event_type via the approx-percentile sketch
    (accuracy 10000) beside the exact F.percentile — the pattern for
    latency/size distributions at corpus scale, where exact percentile
    means a per-group sort."""
    e = _events_secs(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("approx_q"),
            F.percentile("value", F.lit([0.5, 0.9, 0.99])).alias("exact_q"),
        )
        .select(
            "event_type",
            F.col("approx_q")[0].alias("p50_approx"),
            F.col("exact_q")[0].alias("p50_exact"),
            F.col("approx_q")[1].alias("p90_approx"),
            F.col("exact_q")[1].alias("p90_exact"),
            F.col("approx_q")[2].alias("p99_approx"),
            F.col("exact_q")[2].alias("p99_exact"),
        )
        .orderBy("event_type")
    )


REGISTRY: dict[str, QuerySpec] = {
    "approx_distinct": QuerySpec(
        q_approx_distinct, None,
        "HLL++ distinct-count sketch beside the exact count (rows-only check; accuracy bound in tests/test_sketches.py)",
    ),
    "quantile_sketch": QuerySpec(
        q_quantile_sketch, None,
        "approx-percentile sketch beside exact percentiles (rows-only check; accuracy bound in tests/test_sketches.py)",
    ),
}
