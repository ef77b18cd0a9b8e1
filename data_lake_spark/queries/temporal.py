"""Temporal / event-stream queries over ``events``: sessionization and
tumbling-window rollups — the batch faces of the Structured Streaming
operators in ``streaming.incremental`` (Spark's unified semantics: the same
plan runs on a stream with a watermark).

Beyond the reference surface (it has no streaming operators, SURVEY §2.11);
these are the dashboard rollups its serving layer would need at event
granularity. ``events.ts`` is conformed to long epoch nanos at load
(catalog._normalize); both engines reduce it to epoch seconds with
integer division — double arithmetic would lose precision above 2^53 ns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact
from data_lake_spark.queries import QuerySpec
from data_lake_spark.streaming.incremental import sessionize, windowed_event_rollup

_NS = 1_000_000_000


def _events_secs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr(f"ts div {_NS}").alias("ts"),  # long integer division, exact
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session stats: sessionize (30-min gap, lag + cumulative flag —
    one shuffle on user_id, state never spans users) then aggregate each
    session. The streaming twin is applyInPandasWithState; batch and
    stream agree because session assignment is order-deterministic."""
    sess = sessionize(_events_secs(spark, sf_dir), gap_minutes=30)
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_s"),
            F.max("ts").alias("end_s"),
            sum_exact("value").alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


ORACLE_SESSION_STATS = f"""
WITH e AS (
  SELECT user_id, value, epoch_ns(ts) // {_NS} AS ts_s FROM events
),
flagged AS (
  SELECT user_id, value, ts_s,
         CASE WHEN LAG(ts_s) OVER w IS NULL
                OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
),
sess AS (
  SELECT user_id, value, ts_s,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s) AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(ts_s) AS start_s,
       MAX(ts_s) AS end_s,
       {oracle_sum_exact('value')} AS total_value
FROM sess GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_windowed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling-window rollup per event_type via the streaming
    operator (watermark + window; identical plan in batch). Window starts
    align to the epoch, so the oracle's integer bucketing matches
    F.window exactly."""
    ev = _events_secs(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.col("ts"))
    )
    out = windowed_event_rollup(ev, window="15 minutes", watermark="30 minutes")
    return (
        out.select(
            F.col("window_start").cast("long").alias("window_start_s"),
            F.col("window_end").cast("long").alias("window_end_s"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start_s", "event_type")
    )


ORACLE_WINDOWED_ROLLUP = f"""
WITH e AS (
  SELECT event_type, value,
         (epoch_ns(ts) // {_NS}) // 900 * 900 AS w_start
  FROM events
)
SELECT w_start AS window_start_s,
       w_start + 900 AS window_end_s,
       event_type,
       COUNT(*) AS n_events,
       {oracle_sum_exact('value')} AS total_value
FROM e GROUP BY 1, 2, 3 ORDER BY 1, 3
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: every click event gets the most recent
    prior (or simultaneous) view by the same user — the as-of join
    (operators/asof.py: union + one shuffle + ordered carry-forward, the
    composition Spark lacks as a built-in). Right side deduped to one row
    per (user, ts) for determinism."""
    from data_lake_spark.operators.asof import asof_join_backward
    from data_lake_spark.operators.upsert import keep_latest

    e = _events_secs(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = keep_latest(
        e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts", "value"),
        keys=["user_id", "ts"],
        order_col="event_id",
    ).select("user_id", "ts", "value")
    return (
        asof_join_backward(clicks, views, on=["user_id"], ts_col="ts", value_cols=["value"])
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.col("asof_ts").cast("long").alias("asof_ts"),
            F.col("asof_value").cast("double").alias("asof_value"),
        )
        .orderBy("event_id")
    )


ORACLE_ASOF_JOIN = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, value,
         epoch_ns(ts) // {_NS} AS ts_s
  FROM events
),
clicks AS (
  SELECT event_id, user_id, ts_s, value FROM e WHERE event_type = 'click'
),
views_ranked AS (
  SELECT user_id, ts_s, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts_s ORDER BY event_id DESC) AS rn
  FROM e WHERE event_type = 'view'
),
views AS (SELECT user_id, ts_s, value FROM views_ranked WHERE rn = 1)
SELECT c.event_id, c.user_id, c.ts_s AS ts, c.value,
       v.ts_s AS asof_ts, v.value AS asof_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts_s >= v.ts_s
ORDER BY c.event_id
"""


REGISTRY: dict[str, QuerySpec] = {
    "session_stats": QuerySpec(
        q_session_stats, ORACLE_SESSION_STATS, "30-min-gap sessionization + per-session agg"
    ),
    "windowed_rollup": QuerySpec(
        q_windowed_rollup, ORACLE_WINDOWED_ROLLUP, "15-min tumbling rollup (streaming operator, batch face)"
    ),
    "asof_join": QuerySpec(
        q_asof_join, ORACLE_ASOF_JOIN, "backward as-of join (point-in-time enrichment)"
    ),
}
