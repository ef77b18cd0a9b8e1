"""Gap-fill with linear interpolation — the missing-day repair that
date_spine_fill's zero-fill can't express (a sparse revenue series
shouldn't report 0 for a day the pipeline simply lacked data).

Window note (repo policy: no data-bounded single-reducer windows): the
series here is DAILY-aggregated first, so the window input is bounded
by the calendar — one row per day regardless of data volume (6.5 years
= 2405 rows; a century is 36,525). The unbounded-preceding/following
scans run over that calendar-bounded frame, the same
bounded-by-construction argument as ranking.ranked_top_k; the
data-volume-sized work is the daily aggregation, which shuffles on the
uniform date key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact
from data_lake_spark.queries import QuerySpec

# only large orders: leaves ~340 of 2405 days empty at sf0.01 — real
# gaps for the interpolator to fill
_MIN_PRICE = 350000


def q_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily large-order revenue on a dense date spine; missing days
    linearly interpolated between the bracketing observed days (edges
    forward/back-filled). prev/next come from ignore-nulls running
    first/last over the calendar-bounded series."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _MIN_PRICE
    ).select(F.to_date("o_orderdate").alias("d"), "o_totalprice")
    daily = o.groupBy("d").agg(sum_exact("o_totalprice").alias("revenue"))
    spine = (
        o.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(F.explode(F.sequence("mn", "mx")).alias("d"))
    )
    s = spine.join(daily, "d", "left")
    wb = (
        Window.partitionBy(F.lit(0))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(F.lit(0))
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_d = F.when(F.col("revenue").isNotNull(), F.col("d"))
    s = s.select(
        "d",
        "revenue",
        F.last("revenue", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(known_d, ignorenulls=True).over(wb).alias("prev_d"),
        F.first("revenue", ignorenulls=True).over(wf).alias("next_v"),
        F.first(known_d, ignorenulls=True).over(wf).alias("next_d"),
    )
    filled = (
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (
                F.datediff("d", "prev_d")
                / F.datediff("next_d", "prev_d")
            )
        )
    )
    return s.select(
        F.date_format("d", "yyyy-MM-dd").alias("report_date"),
        filled.alias("revenue_filled"),
        F.col("revenue").isNull().cast("long").alias("was_interpolated"),
    ).orderBy("report_date")


ORACLE_GAP_FILL_INTERP = f"""
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice
  FROM orders WHERE o_totalprice > {_MIN_PRICE}
),
daily AS (
  SELECT d, {oracle_sum_exact("o_totalprice")} AS revenue FROM o GROUP BY 1
),
rng AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM o),
spine AS (
  SELECT CAST(UNNEST(GENERATE_SERIES(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
  FROM rng
),
s AS (SELECT spine.d, daily.revenue FROM spine LEFT JOIN daily ON spine.d = daily.d),
f AS (
  SELECT d, revenue,
         LAST_VALUE(revenue IGNORE NULLS) OVER
           (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         LAST_VALUE(CASE WHEN revenue IS NOT NULL THEN d END IGNORE NULLS) OVER
           (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
         FIRST_VALUE(revenue IGNORE NULLS) OVER
           (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         FIRST_VALUE(CASE WHEN revenue IS NOT NULL THEN d END IGNORE NULLS) OVER
           (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM s
)
SELECT STRFTIME(d, '%Y-%m-%d') AS report_date,
       CASE WHEN revenue IS NOT NULL THEN revenue
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            ELSE prev_v + (next_v - prev_v) *
                 ((d - prev_d) / CAST(next_d - prev_d AS DOUBLE))
       END AS revenue_filled,
       CASE WHEN revenue IS NULL THEN 1 ELSE 0 END AS was_interpolated
FROM f ORDER BY report_date
"""


REGISTRY: dict[str, QuerySpec] = {
    "gap_fill_interp": QuerySpec(
        q_gap_fill_interp,
        ORACLE_GAP_FILL_INTERP,
        "date-spine gap fill with linear interpolation between observed days",
    ),
}


# ---------------------------------------------------------------------------
# trend_slopes — grouped OLS regression, closed-form over exact sums
# ---------------------------------------------------------------------------


def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment revenue trend: the least-squares slope (and
    intercept) of monthly revenue against a month index, fitted
    IN-ENGINE from the closed-form normal equations — no driver-side
    math, no iterative solver.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over the per-segment
    monthly points. Everything up to the final division is INTEGER:
    x = months since 1992-01 (≤ ~84), y = monthly revenue in whole
    cents (the functions/exact.py floor recipe), so the sums are exact
    and order-independent — the fit is bit-identical across engines
    and cluster sizes. int64 headroom: at SF 1, Σy ≈ 4.5e12 cents per
    segment, n·Σxy ≤ 84·84·4.5e12 ≈ 3.2e16 ≪ 2⁶³; the closed form
    stays overflow-free under ANSI mode past SF 100.

    Plan: broadcast the customer dim into the fact scan, ONE shuffle
    for the (segment, month) rollup, then a segment-count aggregation —
    map-side-combinable all the way; only 5 fitted rows leave."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
        )
        .cast("long")
        .alias("x"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    monthly = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("c_mktsegment", "x")
        .agg(F.sum("cents").alias("y"))
    )
    fit = monthly.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx")
    # den = 0 ⇔ fewer than two distinct months in the group: no defined
    # slope — guard explicitly, because ANSI mode (Spark 4 default)
    # turns double division by zero into a hard DIVIDE_BY_ZERO error
    # that would kill the whole query, not an IEEE Inf
    raw_slope = num.cast("double") / den.cast("double")
    slope = F.when(den != 0, raw_slope)
    intercept = F.when(
        den != 0,
        (
            F.col("sy").cast("double")
            - raw_slope * F.col("sx").cast("double")
        )
        / F.col("n_months").cast("double"),
    )
    return fit.select(
        "c_mktsegment",
        "n_months",
        slope.alias("slope_cents_mo"),
        intercept.alias("intercept_cents"),
    ).orderBy("c_mktsegment")


ORACLE_TREND_SLOPES = """
WITH o AS (
  SELECT o_custkey,
         CAST((YEAR(o_orderdate) - 1992) * 12
              + MONTH(o_orderdate) - 1 AS BIGINT) AS x,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
monthly AS (
  SELECT c.c_mktsegment, o.x, CAST(SUM(o.cents) AS BIGINT) AS y
  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
fit AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM monthly GROUP BY 1
)
SELECT c_mktsegment, n_months,
       CASE WHEN n_months * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(n_months * sxy - sx * sy AS DOUBLE)
                 / CAST(n_months * sxx - sx * sx AS DOUBLE)
       END AS slope_cents_mo,
       CASE WHEN n_months * sxx - sx * sx = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE)
                  - (CAST(n_months * sxy - sx * sy AS DOUBLE)
                     / CAST(n_months * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n_months AS DOUBLE)
       END AS intercept_cents
FROM fit ORDER BY c_mktsegment
"""


REGISTRY["trend_slopes"] = QuerySpec(
    q_trend_slopes,
    ORACLE_TREND_SLOPES,
    "per-segment monthly-revenue OLS slope/intercept from closed-form "
    "normal equations over exact integer sums",
)


# ---------------------------------------------------------------------------
# interval_overlap — chunked interval join: sessions × incident windows
# ---------------------------------------------------------------------------

_GAP_MIN = 30
_INC_LEN_S = 1800
_CHUNK_S = 3600
_INC_SAMPLE = 20  # every 20th error event opens an incident window


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions overlap which incident windows — the classic
    interval-overlap join, planned with operators/rangejoin.interval_join
    (explode onto 1-hour chunks → hash equi-join → exact-once canonical
    chunk; Spark has no native interval join and the naive form is a
    pair-space nested loop). Sessions are the 30-min-gap sessionization
    (the session_stats shape); incidents are 30-min windows opened by a
    deterministic sample of error events. Overlap seconds are exact
    integer arithmetic end to end."""
    from data_lake_spark.operators.rangejoin import interval_join
    from data_lake_spark.streaming.incremental import sessionize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000000").alias("ts"),
    )
    sessions = (
        sessionize(ev, gap_minutes=_GAP_MIN)
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    incidents = ev.filter(
        (F.col("event_type") == "error")
        & (F.col("event_id") % _INC_SAMPLE == 0)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("i_start"),
        (F.col("ts") + _INC_LEN_S).alias("i_end"),
    )
    return (
        interval_join(
            sessions, incidents, "s_start", "s_end", "i_start", "i_end",
            chunk=_CHUNK_S,
        )
        .select(
            "incident_id",
            "user_id",
            "session_seq",
            (
                F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
            ).alias("overlap_s"),
        )
        .orderBy("incident_id", "user_id", "session_seq")
    )


ORACLE_INTERVAL_OVERLAP = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000000000 AS ts
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > {_GAP_MIN * 60} THEN 1 ELSE 0 END
           AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
           AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, session_seq,
         MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM sess GROUP BY 1, 2
),
incidents AS (
  SELECT event_id AS incident_id, ts AS i_start, ts + {_INC_LEN_S} AS i_end
  FROM e
  WHERE event_type = 'error' AND event_id % {_INC_SAMPLE} = 0
)
SELECT i.incident_id, s.user_id, s.session_seq,
       LEAST(s.s_end, i.i_end) - GREATEST(s.s_start, i.i_start) AS overlap_s
FROM sessions s JOIN incidents i
  ON s.s_start <= i.i_end AND i.i_start <= s.s_end
ORDER BY i.incident_id, s.user_id, s.session_seq
"""


REGISTRY["interval_overlap"] = QuerySpec(
    q_interval_overlap,
    ORACLE_INTERVAL_OVERLAP,
    "chunked interval-overlap join: 30-min-gap sessions x incident "
    "windows, exact-once via the canonical-chunk trick",
)
