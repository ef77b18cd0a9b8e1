"""Temporal analytics, part 2: sliding windows, funnel conversion, cohort
retention, and JSON property extraction over ``events``.

Beyond the reference surface (it has no event-granularity analytics,
SURVEY §2.11) — these are the product-analytics shapes a serving layer
grows into, each built on the engine's existing primitives (F.window with
a slide, the as-of join, integer week bucketing) and each bit-identical
to its DuckDB oracle.

Scale notes:
- sliding windows replicate each event window/slide times map-side (here
  2×) before the one shuffle — the standard cost model, no state;
- the funnel reuses the as-of join: one shuffle on user_id, ordered
  carry-forward, state never spans users;
- cohort retention shuffles user-weeks (distinct'd map-side), then joins
  the per-user cohort week — both sides already partitioned by user_id,
  and the second join is on a dim-sized aggregate;
- timestamps stay long epoch-seconds end-to-end (ts is TIMESTAMP(NANOS)
  → long nanos; integer division only, see temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.queries import QuerySpec
from data_lake_spark.queries.temporal import _NS, _events_secs

_WEEK = 7 * 24 * 3600


# ---------------------------------------------------------------------------
# sliding_rollup — 30-min windows every 15 min
# ---------------------------------------------------------------------------


def q_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute windows sliding every 15 minutes, per event_type: each
    event lands in exactly window/slide = 2 windows (F.window with a
    slideDuration; same plan under a stream + watermark). The oracle
    derives both member windows per event with integer arithmetic —
    Spark's epoch-aligned window starts make them identical."""
    ev = _events_secs(spark, sf_dir).withColumn(
        "tss", F.timestamp_seconds(F.col("ts"))
    )
    w = F.window("tss", "30 minutes", "15 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            F.col("w.end").cast("long").alias("window_end_s"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start_s", "event_type")
    )


ORACLE_SLIDING_ROLLUP = f"""
WITH e AS (
  SELECT event_type, epoch_ns(ts) // {_NS} AS ts_s FROM events
),
member AS (
  SELECT event_type, ts_s,
         (ts_s // 900 - CAST(k.range AS BIGINT)) * 900 AS w_start
  FROM e CROSS JOIN range(0, 2) k
)
SELECT w_start AS window_start_s, w_start + 1800 AS window_end_s,
       event_type, COUNT(*) AS n_events
FROM member GROUP BY 1, 2, 3 ORDER BY 1, 3
"""


# ---------------------------------------------------------------------------
# funnel — view → purchase conversion within 30 minutes
# ---------------------------------------------------------------------------


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: purchases attributed to the most recent prior view
    by the same user within 30 minutes, reported per user. Reuses the
    as-of join operator (operators/asof.py) — the attribution join IS an
    as-of join, so the funnel costs one user_id shuffle. Right side
    deduped to one row per (user, ts) for determinism."""
    from data_lake_spark.operators.asof import asof_join_backward
    from data_lake_spark.operators.upsert import keep_latest

    e = _events_secs(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = keep_latest(
        e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts"),
        keys=["user_id", "ts"],
        order_col="event_id",
    ).select("user_id", "ts")
    attributed = asof_join_backward(
        purchases, views, on=["user_id"], ts_col="ts", value_cols=[]
    )
    return (
        attributed.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("asof_ts").isNotNull()
                    & (F.col("ts") - F.col("asof_ts") <= 1800),
                    1,
                ).otherwise(0)
            ).alias("n_converted"),
        )
        .orderBy("user_id")
    )


ORACLE_FUNNEL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) // {_NS} AS ts_s FROM events
),
purchases AS (
  SELECT event_id, user_id, ts_s FROM e WHERE event_type = 'purchase'
),
views_ranked AS (
  SELECT user_id, ts_s,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts_s ORDER BY event_id DESC) AS rn
  FROM e WHERE event_type = 'view'
),
views AS (SELECT user_id, ts_s FROM views_ranked WHERE rn = 1),
attributed AS (
  SELECT p.user_id, p.ts_s, v.ts_s AS asof_ts
  FROM purchases p ASOF LEFT JOIN views v
    ON p.user_id = v.user_id AND p.ts_s >= v.ts_s
)
SELECT user_id, COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN asof_ts IS NOT NULL AND ts_s - asof_ts <= 1800
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM attributed GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# cohort_retention — weekly cohorts × week offset
# ---------------------------------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: users grouped by first-seen week
    (cohort), counted as retained in each later week they were active.
    Week buckets are integer epoch-week numbers — no calendar ambiguity
    across engines. Two shuffles total: user→min week, then the distinct
    user-week activity joined back to the per-user cohort."""
    e = _events_secs(spark, sf_dir)
    weeks = e.select("user_id", F.expr(f"ts div {_WEEK}").alias("week"))
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = weeks.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


ORACLE_COHORT_RETENTION = f"""
WITH weeks AS (
  SELECT user_id, (epoch_ns(ts) // {_NS}) // {_WEEK} AS week FROM events
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY 1
),
activity AS (SELECT DISTINCT user_id, week FROM weeks)
SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# json_props — semi-structured property extraction
# ---------------------------------------------------------------------------


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the events ``props`` column
    (get_json_object — the schema-on-read path for semi-structured
    payloads, the engine-side version of the reference's JSON ingestion,
    SURVEY §2.1 S1). Aggregated per event_type with integer stats."""
    from data_lake_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


ORACLE_JSON_PROPS = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS k_sum,
       MAX(CAST(props ->> '$.k' AS BIGINT)) AS k_max
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# scd2_history — versioned dimension built from event history
# ---------------------------------------------------------------------------

_OPEN = 99_999_999


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension from event history: each user's latest daily JSON
    property, bucketed, folded into validity intervals by the SCD2
    operator (operators/scd.py — consecutive-duplicate collapse + lead
    window). The reference overwrites its user dim in place and loses
    history (BronzeIngestUsers.py:69-77); this is the lakehouse answer.
    Day keys are integer epoch-days; the open end is a sentinel int."""
    from data_lake_spark.catalog import load_table
    from data_lake_spark.operators.scd import scd2_apply
    from data_lake_spark.operators.upsert import keep_latest

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(f"(ts div {_NS}) div 86400").alias("day"),
        F.expr(f"ts div {_NS}").alias("ts_s"),
        (F.get_json_object("props", "$.k").cast("long") / 25)
        .cast("long")
        .alias("k_bucket"),
    )
    daily = keep_latest(
        ev, keys=["user_id", "day"], order_col="ts_s", tiebreak=["event_id"]
    ).select("user_id", "k_bucket", F.col("day").alias("eff_date"))
    empty = spark.createDataFrame(
        [], "user_id long, k_bucket long, valid_from long"
    )
    return (
        scd2_apply(
            empty, daily, key="user_id", attrs=["k_bucket"], open_end=_OPEN
        )
        .select("user_id", "k_bucket", "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "valid_from")
    )


ORACLE_SCD2_HISTORY = f"""
WITH e AS (
  SELECT event_id, user_id,
         (epoch_ns(ts) // {_NS}) // 86400 AS day,
         epoch_ns(ts) // {_NS} AS ts_s,
         CAST(props ->> '$.k' AS BIGINT) // 25 AS k_bucket
  FROM events
),
daily AS (
  SELECT user_id, k_bucket, day AS valid_from FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
                                 ORDER BY ts_s DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
),
changed AS (
  SELECT user_id, k_bucket, valid_from FROM (
    SELECT *, LAG(k_bucket) OVER (PARTITION BY user_id ORDER BY valid_from) AS pk
    FROM daily
  ) WHERE pk IS NULL OR k_bucket != pk
)
SELECT user_id, k_bucket, valid_from,
       COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
                {_OPEN}) AS valid_to,
       CAST(COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
                {_OPEN}) = {_OPEN} AS BIGINT) AS is_current
FROM changed ORDER BY user_id, valid_from
"""


REGISTRY: dict[str, QuerySpec] = {
    "sliding_rollup": QuerySpec(
        q_sliding_rollup, ORACLE_SLIDING_ROLLUP,
        "30-min/15-min sliding windows per event_type",
    ),
    "funnel": QuerySpec(
        q_funnel, ORACLE_FUNNEL,
        "view→purchase funnel via as-of attribution",
    ),
    "cohort_retention": QuerySpec(
        q_cohort_retention, ORACLE_COHORT_RETENTION,
        "weekly cohort retention matrix",
    ),
    "json_props": QuerySpec(
        q_json_props, ORACLE_JSON_PROPS,
        "JSON property extraction + rollup",
    ),
    "scd2_history": QuerySpec(
        q_scd2_history, ORACLE_SCD2_HISTORY,
        "SCD2 versioned dimension folded from event history",
    ),
}
