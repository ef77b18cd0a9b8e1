"""Time-series monitoring over the event stream and the orders fact:
trailing-window anomaly detection and mergeable-sketch sliding distinct
counts — the two rollups an operations dashboard runs continuously.

Scale discipline (repo policy): every window here is CALENDAR-BOUNDED —
the series is aggregated to one row per day first, so window input is
days, never data volume (the temporal4 gap-fill argument). The sliding
distinct additionally demonstrates the PRODUCTION sketch shape: one
fixed-size HLL partial per day, each trailing window merging 7 partials
— re-scanning no events — which is how a 100 TB stream serves arbitrary
window distinct counts from kilobytes of state.

Day arithmetic is tz-free integer math (epoch nanos div 86400e9), the
events normalization contract (catalog._normalize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact
from data_lake_spark.queries import QuerySpec

_DAY_NS = 86_400 * 10**9
_WIN = 7
_HLL_TOL = 0.05


def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per trailing 7-day window, both ways at once:
    EXACT (explode each day's events onto the 7 windows it serves —
    a co-partitioned equi-join shape, no inequality join) and the HLL
    path (one datasketches partial per day, union-merged per window),
    reduced to the approx_distinct-style within-tolerance boolean.
    The sketch side touches (days × 7) kilobyte rows where the exact
    side re-shuffles (events × 7) — the gap that pays for sketches at
    volume."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"ts div {_DAY_NS}").alias("d"), "user_id"
    )
    win_days = F.explode(
        F.sequence(F.col("d"), F.col("d") + F.lit(_WIN - 1))
    ).alias("win_d")
    exact = (
        ev.select(win_days, "user_id")
        .groupBy("win_d")
        .agg(F.count_distinct("user_id").alias("exact_users_7d"))
    )
    daily_sk = ev.groupBy("d").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    approx = (
        daily_sk.select(
            F.explode(
                F.sequence(F.col("d"), F.col("d") + F.lit(_WIN - 1))
            ).alias("win_d"),
            "sk",
            "n_ev",
        )
        .groupBy("win_d")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n_ev").alias("n_events_7d"),
        )
    )
    observed = daily_sk.select(F.col("d").alias("win_d"))
    rel_err = F.abs(
        F.col("approx_users").cast("double")
        - F.col("exact_users_7d").cast("double")
    ) / F.col("exact_users_7d").cast("double")
    return (
        exact.join(approx, "win_d")
        .join(observed, "win_d", "left_semi")  # report observed days only
        .select(
            F.col("win_d").alias("day_idx"),
            "exact_users_7d",
            F.col("n_events_7d").cast("long").alias("n_events_7d"),
            (rel_err <= F.lit(_HLL_TOL)).alias("within_tolerance"),
        )
        .orderBy("day_idx")
    )


ORACLE_SLIDING_DISTINCT = f"""
WITH e AS (
  SELECT epoch_ns(ts) // {_DAY_NS} AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM e),
win AS (
  SELECT w.d AS day_idx,
         COUNT(DISTINCT e.user_id) AS exact_users_7d,
         CAST(COUNT(*) AS BIGINT) AS n_events_7d
  FROM days w JOIN e ON e.d BETWEEN w.d - {_WIN - 1} AND w.d
  GROUP BY 1
)
SELECT day_idx, exact_users_7d, n_events_7d, TRUE AS within_tolerance
FROM win ORDER BY day_idx
"""


_LOOKBACK = 28
_K_IQR = 3


def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue anomaly days: each day's exact revenue scored against its
    TRAILING 28-day window (exclusive — the day never scores itself)
    by robust statistics: flag |x − median| > 3·IQR. Median/IQR instead
    of mean/σ so one spike can't mask the next (the breakdown-point
    argument); exact percentiles over the trailing frame, F.percentile
    ≡ DuckDB QUANTILE_CONT bit-for-bit (percentile_report precedent).
    Window input is the daily series — calendar-bounded, one row per
    day. Emits only flagged days plus the bracketing stats."""
    # o_orderdate is TIMESTAMP_NTZ: day index via wall-clock DATE
    # arithmetic (datediff from the epoch date) — an NTZ→TIMESTAMP cast
    # would shift with the session timezone (the catalog._normalize rule)
    o = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
        "o_totalprice",
    )
    daily = o.groupBy("d").agg(sum_exact("o_totalprice").alias("rev"))
    w = (
        Window.orderBy("d")
        .rowsBetween(-_LOOKBACK, -1)
    )
    scored = daily.select(
        "d",
        "rev",
        F.percentile("rev", F.lit(0.5)).over(w).alias("med"),
        F.percentile("rev", F.lit(0.75)).over(w).alias("p75"),
        F.percentile("rev", F.lit(0.25)).over(w).alias("p25"),
        F.count("rev").over(w).alias("n_window"),
    ).filter(F.col("n_window") >= _LOOKBACK)  # full lookback only
    iqr = F.col("p75") - F.col("p25")
    return (
        scored.filter(F.abs(F.col("rev") - F.col("med")) > _K_IQR * iqr)
        .select(
            F.col("d").alias("day_idx"),
            "rev",
            "med",
            (F.col("p75") - F.col("p25")).alias("iqr"),
        )
        .orderBy("day_idx")
    )


ORACLE_ANOMALY_DAYS = f"""
WITH o AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         o_totalprice
  FROM orders
),
daily AS (
  SELECT d, {oracle_sum_exact("o_totalprice")} AS rev FROM o GROUP BY 1
),
scored AS (
  SELECT d, rev,
         QUANTILE_CONT(rev, 0.5) OVER w AS med,
         QUANTILE_CONT(rev, 0.75) OVER w AS p75,
         QUANTILE_CONT(rev, 0.25) OVER w AS p25,
         COUNT(rev) OVER w AS n_window
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN {_LOOKBACK} PRECEDING
               AND 1 PRECEDING)
)
SELECT d AS day_idx, rev, med, p75 - p25 AS iqr
FROM scored
WHERE n_window >= {_LOOKBACK}
  AND ABS(rev - med) > {_K_IQR} * (p75 - p25)
ORDER BY day_idx
"""


REGISTRY: dict[str, QuerySpec] = {
    "sliding_distinct": QuerySpec(
        q_sliding_distinct,
        ORACLE_SLIDING_DISTINCT,
        "trailing-7-day distinct users: daily HLL partials union-merged "
        "per window beside the exact explode-join count",
    ),
    "anomaly_days": QuerySpec(
        q_anomaly_days,
        ORACLE_ANOMALY_DAYS,
        "robust trailing-window anomaly days: |rev - median| > 3*IQR "
        "over the exclusive 28-day frame",
    ),
}


# ---------------------------------------------------------------------------
# rolling_corr — trailing cross-series correlation
# ---------------------------------------------------------------------------

_CORR_W = 28  # trailing window, inclusive of the current day


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 28-day Pearson correlation between the URGENT/HIGH-
    priority daily revenue series and the rest — the coupling monitor:
    the two series normally move together (both track overall demand),
    so a window where r collapses means one order class decoupled (a
    partner feed stalled, a priority-specific outage) before either
    series alone looks anomalous.

    Exactness/overflow (the 100 TB audit): each series is quantized to
    whole DOLLARS per day — cents via floor(price·100), summed as exact
    int64, then div 100 — so every windowed moment stays integer:
    Σx, Σy, Σxy, Σx², Σy² over 28 days of ≤~10⁷-dollar days keep
    n·Σxy ≤ ~10¹⁷, two orders inside int64 where a cents-scale series
    overflows at SF 100. Pearson r then takes ONE float step at the
    edge (the sq_search rule): num/den in binary64 from exact int64
    moments — int→double, sqrt, multiply, divide, floor·10⁶ are all
    IEEE-deterministic, so r_micro is bit-identical across engines. A
    constant series (zero variance) reports NULL, not divide-by-zero.

    Plan: one conditional groupBy(d) (map-side combinable), five window
    sums over the calendar-bounded daily frame (one row per day — the
    anomaly_days precedent), map-only arithmetic after. 1 shuffle."""
    o = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
        "o_totalprice",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("hot"),
    ).withColumn(
        "cents", F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")
    )
    daily = o.groupBy("d").agg(
        F.expr("sum(CASE WHEN hot THEN cents ELSE 0 END) div 100").alias("x"),
        F.expr("sum(CASE WHEN hot THEN 0 ELSE cents END) div 100").alias("y"),
    )
    w = Window.orderBy("d").rowsBetween(-(_CORR_W - 1), 0)
    m = daily.select(
        "d",
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.count("x").over(w).alias("n"),
    ).filter(F.col("n") >= _CORR_W)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("d").alias("day_idx"),
        "sx",
        "sy",
        F.when(
            (d1 > 0) & (d2 > 0),
            F.expr(
                "CAST(FLOOR((n * sxy - sx * sy) * 1000000.0 /"
                " (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
                " * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)"
            ),
        ).alias("r_micro"),
    ).orderBy("day_idx")


ORACLE_ROLLING_CORR = f"""
WITH o AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority IN ('1-URGENT', '2-HIGH') AS hot
  FROM orders
),
daily AS (
  SELECT d,
         SUM(CASE WHEN hot THEN cents ELSE 0 END) // 100 AS x,
         SUM(CASE WHEN hot THEN 0 ELSE cents END) // 100 AS y
  FROM o GROUP BY 1
),
m AS (
  SELECT d,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
         COUNT(x) OVER w AS n
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN {_CORR_W - 1} PRECEDING
               AND CURRENT ROW)
)
SELECT d AS day_idx, sx, sy,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(FLOOR((n * sxy - sx * sy) * 1000000.0 /
                 (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
       END AS r_micro
FROM m WHERE n >= {_CORR_W}
ORDER BY day_idx
"""


REGISTRY["rolling_corr"] = QuerySpec(
    q_rolling_corr,
    ORACLE_ROLLING_CORR,
    "trailing 28-day Pearson correlation between priority-class daily "
    "revenue series (exact integer moments, one float step at the edge)",
)
