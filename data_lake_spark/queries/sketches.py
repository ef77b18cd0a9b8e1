"""Approximate (sketch-based) aggregation queries — the operators that make
100 TB interactive: HyperLogLog++ distinct counts and t-digest-style
quantiles run in O(sketch) memory per group and merge associatively across
partitions, where their exact twins need a full shuffle of the distinct
values (or a sort).

Sketch values themselves are engine-specific (Spark HLL++ /
approx-percentile internals), so cross-engine equality on the raw sketch
output is undefined. The driver-checkable contract is instead: each query
computes BOTH the sketch and its exact twin in-engine, reduces the sketch
to a ``within_tolerance`` boolean, and returns only the exact columns plus
that boolean. The DuckDB oracle recomputes the exact columns and asserts
``within_tolerance = true`` — so a sketch drifting outside its error bound
is a hard driver mismatch, not an unverifiable rows-only pass. The finer
accuracy characterization stays in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.queries import QuerySpec
from data_lake_spark.queries.temporal import _events_secs

# HLL++ relative standard deviation we request, and the bound we assert.
# rsd is one standard error; 3σ covers ~99.7% of groups, and the driver
# checks a handful of groups, so 3σ is a safe hard bound.
_HLL_RSD = 0.02
_HLL_BOUND = 3 * _HLL_RSD

# percentile_approx accuracy parameter → rank error ≤ 1/accuracy. The
# sketch returns an order statistic, so the correct bound is on RANK, not
# value: the returned element must lie between the exact percentiles at
# q ± _PCT_RANK_EPS. 0.03 covers the sketch's 1/10000 rank error plus the
# element-vs-interpolation offset (~1/n) for groups of ≥100 rows; value
# gaps in sparse tails don't false-alarm under a rank bound.
_PCT_ACCURACY = 10000
_PCT_RANK_EPS = 0.03


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type: HLL++ sketch (rsd 2%) beside the
    exact count, reduced to a within-3σ boolean. At scale the sketch is a
    map-side-mergeable fixed-size state; the exact count re-shuffles every
    distinct (event_type, user_id) pair."""
    e = _events_secs(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=_HLL_RSD).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    rel_err = F.abs(
        F.col("approx_users").cast("double") - F.col("exact_users").cast("double")
    ) / F.col("exact_users").cast("double")
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (rel_err <= F.lit(_HLL_BOUND)).alias("within_tolerance"),
    ).orderBy("event_type")


ORACLE_APPROX_DISTINCT = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(*) AS n_events,
       TRUE AS within_tolerance
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value quantiles per event_type via the approx-percentile sketch
    (accuracy 10000) beside the exact F.percentile (bit-identical to
    DuckDB QUANTILE_CONT), reduced to a rank-bound boolean: each sketch
    value must lie between the exact percentiles at q ± 0.03 — the
    pattern for latency/size distributions at corpus scale, where exact
    percentile means a per-group sort."""
    e = _events_secs(spark, sf_dir)
    qs = [0.5, 0.9, 0.99]
    lo_fr = [max(0.0, q - _PCT_RANK_EPS) for q in qs]
    hi_fr = [min(1.0, q + _PCT_RANK_EPS) for q in qs]
    agg = e.groupBy("event_type").agg(
        F.percentile_approx("value", qs, _PCT_ACCURACY).alias("approx_q"),
        F.percentile("value", F.lit(qs)).alias("exact_q"),
        F.percentile("value", F.lit(lo_fr)).alias("lo_q"),
        F.percentile("value", F.lit(hi_fr)).alias("hi_q"),
    )
    eps = F.lit(1e-9)
    within = (
        (F.col("approx_q")[0] >= F.col("lo_q")[0] - eps)
        & (F.col("approx_q")[0] <= F.col("hi_q")[0] + eps)
        & (F.col("approx_q")[1] >= F.col("lo_q")[1] - eps)
        & (F.col("approx_q")[1] <= F.col("hi_q")[1] + eps)
        & (F.col("approx_q")[2] >= F.col("lo_q")[2] - eps)
        & (F.col("approx_q")[2] <= F.col("hi_q")[2] + eps)
    )
    return agg.select(
        "event_type",
        F.col("exact_q")[0].alias("p50_exact"),
        F.col("exact_q")[1].alias("p90_exact"),
        F.col("exact_q")[2].alias("p99_exact"),
        within.alias("within_tolerance"),
    ).orderBy("event_type")


ORACLE_QUANTILE_SKETCH = """
SELECT event_type,
       QUANTILE_CONT(value, 0.5) AS p50_exact,
       QUANTILE_CONT(value, 0.9) AS p90_exact,
       QUANTILE_CONT(value, 0.99) AS p99_exact,
       TRUE AS within_tolerance
FROM events GROUP BY event_type ORDER BY event_type
"""


REGISTRY: dict[str, QuerySpec] = {
    "approx_distinct": QuerySpec(
        q_approx_distinct, ORACLE_APPROX_DISTINCT,
        "HLL++ distinct-count sketch reduced to a within-3σ boolean beside "
        "the exact count (oracle asserts the exact columns and the bound)",
    ),
    "quantile_sketch": QuerySpec(
        q_quantile_sketch, ORACLE_QUANTILE_SKETCH,
        "approx-percentile sketch reduced to a within-1%-of-range boolean "
        "beside exact percentiles (oracle asserts exact columns and bound)",
    ),
}
