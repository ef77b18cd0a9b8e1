"""Temporal/reshaping queries, part 3: date-spine gap filling (the
reference's client-side null-fill done in-engine), wide→long unpivot,
and the native session_window operator.

The reference's earnings endpoint fetches a sparse per-date series and
null-fills missing dates in Python (earnings.py:162-213) — a driver-side
loop that breaks at scale. ``date_spine_fill`` produces the dense series
inside the engine: the spine is generated from a 1-row min/max aggregate
(sequence + explode) so it is days-sized and broadcastable; the fact side
aggregates once and left-joins against it.

``session_native`` is the built-in ``F.session_window`` — the same
gap-merge sessionization as queries/temporal.py's lag+cumsum
``session_stats``, but expressed with the operator Structured Streaming
can run stateful. Boundary semantics verified against real collisions at
sf0.1: an event exactly gap seconds after its predecessor MERGES (the
[t, t+gap] envelope is closed), i.e. a new session opens only at
gap > 30 min — identical to the lag formulation's ``>`` test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact
from data_lake_spark.operators.ranking import ranked_top_k
from data_lake_spark.queries import QuerySpec

_NS = 1_000_000_000


# ---------------------------------------------------------------------------
# date_spine_fill — dense daily series with zero-filled gaps
# ---------------------------------------------------------------------------


def q_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue series over the full order-date range:
    per-day totals left-joined onto a generated date spine, gaps filled
    with zero and flagged. In-engine replacement for the reference's
    Python null-fill (earnings.py:162-213)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), "o_totalprice"
    )
    daily = orders.groupBy("d").agg(
        sum_exact("o_totalprice").alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    spine = (
        orders.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("d"))
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("report_date"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.col("revenue").isNull().cast("long").alias("was_missing"),
        )
        .orderBy("report_date")
    )


ORACLE_DATE_SPINE_FILL = f"""
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders
),
daily AS (
  SELECT d, {oracle_sum_exact("o_totalprice")} AS revenue,
         COUNT(*) AS n_orders
  FROM o GROUP BY 1
),
rng AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM o),
spine AS (
  SELECT CAST(UNNEST(GENERATE_SERIES(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
  FROM rng
)
SELECT STRFTIME(s.d, '%Y-%m-%d') AS report_date,
       COALESCE(daily.revenue, 0.0) AS revenue,
       COALESCE(daily.n_orders, 0) AS n_orders,
       CAST(daily.revenue IS NULL AS BIGINT) AS was_missing
FROM spine s LEFT JOIN daily ON s.d = daily.d
ORDER BY report_date
"""


# ---------------------------------------------------------------------------
# unpivot_metrics — wide→long melt of a multi-metric aggregate
# ---------------------------------------------------------------------------


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation multi-metric aggregate melted to long form with the
    built-in ``unpivot`` (wide→long is a zero-shuffle projection after
    the one aggregate shuffle) — the tidy-series shape the reference's
    dashboards reshape client-side."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    wide = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            sum_exact("c_acctbal").alias("total_balance"),
            F.count("*").cast("double").alias("n_customers"),
        )
    )
    return (
        wide.unpivot(
            "nation",
            ["total_balance", "n_customers"],
            "metric",
            "value",
        )
        .orderBy("nation", "metric")
    )


ORACLE_UNPIVOT_METRICS = f"""
WITH wide AS (
  SELECT n.n_name AS nation,
         {oracle_sum_exact("c.c_acctbal")} AS total_balance,
         CAST(COUNT(*) AS DOUBLE) AS n_customers
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation, 'total_balance' AS metric, total_balance AS value FROM wide
UNION ALL
SELECT nation, 'n_customers', n_customers FROM wide
ORDER BY nation, metric
"""


# ---------------------------------------------------------------------------
# session_native — built-in session_window sessionization
# ---------------------------------------------------------------------------


def q_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via the native ``F.session_window`` (30-minute
    gap): one groupBy on (user, session_window) — the operator Structured
    Streaming runs with managed state, here on its batch face. New
    session only at gap > 30 min (closed envelope, see module
    docstring)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.timestamp_seconds(F.expr(f"ts div {_NS}")).alias("tss"),
    )
    return (
        ev.groupBy("user_id", F.session_window("tss", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            sum_exact("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").cast("long").alias("start_s"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "start_s")
    )


ORACLE_SESSION_NATIVE = f"""
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
SELECT user_id, MIN(ts_s) AS start_s,
       COUNT(*) AS n_events,
       {oracle_sum_exact('value')} AS total_value
FROM sess GROUP BY user_id, session_seq
ORDER BY user_id, start_s
"""


# ---------------------------------------------------------------------------
# top_paths — most common event sequences per session
# ---------------------------------------------------------------------------


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: sessionize (30-min gap), take each session's first
    5 events in time order, join them into a '>'-separated path string,
    rank the 20 most common paths. The collect_list is ordered
    deterministically by sorting (ts, event_id) structs — collect order
    is partition-dependent, array_sort makes it reproducible at any
    cluster size."""
    from data_lake_spark.streaming.incremental import sessionize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(f"ts div {_NS}").alias("ts"),
    )
    sess = sessionize(ev, gap_minutes=30)
    paths = (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">",
                F.transform(F.slice("evs", 1, 5), lambda x: x["event_type"]),
            ).alias("path")
        )
    )
    agg = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    # top-20 via TakeOrderedAndProject (per-partition heaps — the path
    # dimension can be huge at scale), ranked in the same pass over the
    # k-bounded survivors: no unbounded single-reducer window, no extra
    # materialization jobs.
    keys = [F.col("n_sessions").desc(), F.col("path").asc()]
    return (
        ranked_top_k(agg, keys, 20, "rk")
        .withColumn("rk", F.col("rk").cast("long"))
        .select("path", "n_sessions", "rk")
        .orderBy("rk")
    )


ORACLE_TOP_PATHS = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) // {_NS} AS ts_s
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN LAG(ts_s) OVER w IS NULL
                   OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
              AS session_seq
  FROM flagged
),
first5 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                 ORDER BY ts_s, event_id) AS rn
    FROM sess
  ) WHERE rn <= 5
),
paths AS (
  SELECT STRING_AGG(event_type, '>' ORDER BY ts_s, event_id) AS path
  FROM first5 GROUP BY user_id, session_seq
)
SELECT path, COUNT(*) AS n_sessions,
       CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS BIGINT) AS rk
FROM paths GROUP BY path
QUALIFY rk <= 20 ORDER BY rk
"""


REGISTRY: dict[str, QuerySpec] = {
    "top_paths": QuerySpec(
        q_top_paths, ORACLE_TOP_PATHS,
        "top-20 session event paths (ordered first-5 sequence mining)",
    ),
    "date_spine_fill": QuerySpec(
        q_date_spine_fill, ORACLE_DATE_SPINE_FILL,
        "dense daily series: generated date spine + zero-filled gaps",
    ),
    "unpivot_metrics": QuerySpec(
        q_unpivot_metrics, ORACLE_UNPIVOT_METRICS,
        "wide→long unpivot of a multi-metric aggregate",
    ),
    "session_native": QuerySpec(
        q_session_native, ORACLE_SESSION_NATIVE,
        "native session_window gap sessionization (streaming-capable)",
    ),
}
