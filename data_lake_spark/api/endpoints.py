"""The reference's 8 analytics endpoints as PySpark query functions.

Each function replaces one Lambda handler (SURVEY §3.1): the f-string SQL
assembly becomes a parameterized DataFrame plan (Catalyst is the IR), the
Athena submit/poll/fetch loop disappears, and the §2.13 Python
post-processing (pivot/null-fill, zero-default rows, pagination) is folded
into the plan. Validation of params stays Python, as in the reference.

All money aggregation uses the exact-micros recipe (functions/exact.py);
the reference's ROUND(x, 2) becomes :func:`round2` — ``floor(x*100+0.5)/
100`` — which is Presto's half-up rounding expressed in deterministic IEEE
ops. Where the reference SUMs already-rounded values (models distribution,
day-of-week percentages) we carry exact integer cents instead, so
re-aggregation stays order-independent.

Reference citations per function. Dims broadcast; facts aggregate before
any window/full-outer step, so every shuffle is on pre-aggregated,
dim-sized frames — the 100 TB plan shape.
"""

from __future__ import annotations

from datetime import datetime
from functools import reduce
from operator import or_
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lake_spark.functions.dates import dow_presto, week_presto
from data_lake_spark.functions.exact import micros_to_amount, sum_micros
from data_lake_spark.operators.ranking import top_k as rk_top_k
from data_lake_spark.operators.ranking import with_broadcast_scalar

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def round2(col: Column) -> Column:
    """Presto ROUND(x, 2) for non-negative x, in deterministic IEEE ops."""
    return F.floor(col * 100 + F.lit(0.5)) / F.lit(100.0)


def cents(col: Column) -> Column:
    """round2 kept as exact integer cents (long) for safe re-aggregation."""
    return F.floor(col * 100 + F.lit(0.5))


def location_filter(
    locations: Optional[list[dict]],
    user_selected: Optional[str] = None,
) -> Optional[Column]:
    """The dynamic OR-of-equalities filter every endpoint builds
    (reference earnings.py:51-66): request locations (officeName/cityName)
    plus optionally the selected user id, OR-joined. Returns None when
    empty. Parameterized Columns — the reference's quote-escaping (P9)
    is structurally unnecessary here."""
    exprs: list[Column] = []
    for loc in locations or []:
        if loc.get("officeName"):
            exprs.append(F.col("office") == loc["officeName"])
        elif loc.get("cityName"):
            exprs.append(F.col("city") == loc["cityName"])
    if user_selected:
        exprs.append(F.col("_id") == user_selected)
    return reduce(or_, exprs) if exprs else None


def _apply(df: DataFrame, cond: Optional[Column]) -> DataFrame:
    return df.filter(cond) if cond is not None else df


def _perf_union(
    jasmin: DataFrame, streamate: DataFrame, platform: Optional[str]
) -> DataFrame:
    cols = ["_id", "date", "total_earnings", "online_seconds"]
    if platform == "jasmin":
        return jasmin.select(*cols)
    if platform == "streamate":
        return streamate.select(*cols)
    return jasmin.select(*cols).unionByName(streamate.select(*cols))


def _dated(perf: DataFrame) -> DataFrame:
    return perf.withColumn("d", F.to_date("date"))


def _validate_dates(*dates: Optional[str]) -> None:
    for d in dates:
        if d is not None:
            datetime.strptime(d, "%Y-%m-%d")


# ---------------------------------------------------------------------------
# 1. earnings — per-platform daily series (reference earnings.py)
# ---------------------------------------------------------------------------


def earnings(
    users: DataFrame,
    jasmin: DataFrame,
    streamate: DataFrame,
    start_date: str,
    locations: Optional[list[dict]] = None,
    user_selected: Optional[str] = None,
    platform: Optional[str] = None,
) -> DataFrame:
    """Daily earnings series per platform (earnings.py:69-114), with the
    client-side pivot/null-fill (earnings.py:162-213) folded in: one row
    per date, zero-filled per-platform columns."""
    _validate_dates(start_date)
    cond = location_filter(locations, user_selected)
    u = F.broadcast(_apply(users, cond).select("_id"))

    def side(perf: DataFrame, label: str) -> DataFrame:
        return (
            _dated(perf)
            .filter(F.col("d") >= F.lit(start_date))
            .join(u, "_id")
            .select("date", "total_earnings", F.lit(label).alias("source"))
        )

    sides = []
    if platform in (None, "", "all", "jasmin"):
        sides.append(side(jasmin, "Jasmin"))
    if platform in (None, "", "all", "streamate"):
        sides.append(side(streamate, "Streamate"))
    both = reduce(DataFrame.unionByName, sides)
    pivoted = (
        both.groupBy(F.col("date").alias("report_date"))
        .pivot("source", ["Jasmin", "Streamate"])
        .agg(sum_micros("total_earnings"))
    )
    return pivoted.select(
        "report_date",
        micros_to_amount(F.coalesce(F.col("Jasmin"), F.lit(0))).alias("jasmin"),
        micros_to_amount(F.coalesce(F.col("Streamate"), F.lit(0))).alias("streamate"),
    ).orderBy("report_date")


# ---------------------------------------------------------------------------
# 2. needle — current vs historical-average gauge (reference needle.py)
# ---------------------------------------------------------------------------


def deduce_time_unit(start_date: str, end_date: str) -> str:
    """Period-unit inference from the date span (needle.py:7-23)."""
    delta = (
        datetime.strptime(end_date, "%Y-%m-%d")
        - datetime.strptime(start_date, "%Y-%m-%d")
    ).days
    if delta == 0:
        return "day"
    if delta <= 7:
        return "week"
    if delta <= 15:
        return "biweek"
    if delta <= 30:
        return "month"
    if delta <= 90:
        return "quarter"
    return "year"


_SHIFTS = {"day": 1, "week": 7, "biweek": 14}
_MONTH_SHIFTS = {"month": 1, "quarter": 3, "year": 12}


def needle(
    users: DataFrame,
    jasmin: DataFrame,
    streamate: DataFrame,
    start_date: str,
    end_date: str,
    locations: Optional[list[dict]] = None,
    user_selected: Optional[str] = None,
    platform: Optional[str] = None,
) -> DataFrame:
    """current_value (sum over the requested range) vs target_value (avg of
    per-period sums over the immediately-preceding range), period unit
    deduced from the span (needle.py:84-136). The reference's LEFT JOIN is
    effectively inner because of the WHERE on the right side (SURVEY J3)."""
    _validate_dates(start_date, end_date)
    unit = deduce_time_unit(start_date, end_date)
    cond = location_filter(locations, user_selected)
    u = F.broadcast(_apply(users, cond).select("_id"))
    perf = _dated(_perf_union(jasmin, streamate, platform)).join(u, "_id")

    cur = perf.filter(
        F.col("d").between(F.lit(start_date), F.lit(end_date))
    ).agg(micros_to_amount(sum_micros("total_earnings")).alias("current_value"))

    s, e = F.lit(start_date).cast("date"), F.lit(end_date).cast("date")
    if unit in _SHIFTS:
        n = _SHIFTS[unit]
        lo, hi = F.date_sub(s, n), F.date_sub(e, n)
    else:
        n = _MONTH_SHIFTS[unit]
        lo, hi = F.add_months(s, -n), F.add_months(e, -n)

    if unit == "day":
        bucket = F.dayofmonth("d").cast("long")
    elif unit == "week":
        bucket = week_presto("d")
    elif unit == "biweek":
        bucket = F.floor(week_presto("d") / 2)
    elif unit == "month":
        bucket = F.month("d").cast("long")
    elif unit == "quarter":
        bucket = F.quarter("d").cast("long")
    else:
        bucket = F.year("d").cast("long")

    hist = (
        perf.filter(F.col("d").between(lo, hi))
        .groupBy(bucket.alias("period"))
        .agg(sum_micros("total_earnings").alias("s"))
        .agg(
            (micros_to_amount(F.sum("s")) / F.count("s")).alias("target_value")
        )
    )
    return cur.crossJoin(hist).select(
        "current_value", "target_value", F.lit(unit).alias("time_unit")
    )


# ---------------------------------------------------------------------------
# 3. averageProfitability — earnings/hour gauge (averageProfitability.py)
# ---------------------------------------------------------------------------


def average_profitability(
    users: DataFrame,
    jasmin: DataFrame,
    streamate: DataFrame,
    start_date: str,
    end_date: str,
    locations: Optional[list[dict]] = None,
    user_selected: Optional[str] = None,
    platform: Optional[str] = None,
) -> DataFrame:
    """Per-hour profitability (averageProfitability.py:72-110): BASE
    literal dim INNER JOIN a 'Total'-labeled aggregate — so only the Total
    row survives, exactly like the reference."""
    _validate_dates(start_date, end_date)
    cond = location_filter(locations, user_selected)
    u = F.broadcast(_apply(users, cond).select("_id"))
    perf = _dated(_perf_union(jasmin, streamate, platform)).join(u, "_id")
    te = (
        perf.filter(F.col("d").between(F.lit(start_date), F.lit(end_date)))
        .agg(
            sum_micros(F.coalesce(F.col("total_earnings"), F.lit(0.0))).alias("e_m"),
            F.sum(F.coalesce(F.col("online_seconds"), F.lit(0))).alias("secs"),
        )
        .select(F.lit("Total").alias("transmissionType"), "e_m", "secs")
    )
    from data_lake_spark.functions.localframe import values_df

    base = values_df(
        users.sparkSession,
        [("Toy",), ("Privada",), ("Total",)],
        "transmissionType string",
    )
    amt = micros_to_amount(F.col("e_m"))
    return (
        base.join(F.broadcast(te), "transmissionType", "inner")
        .select(
            F.col("transmissionType").alias("id"),
            F.col("transmissionType").alias("label"),
            amt.alias("total_value"),
            F.col("secs").cast("double").alias("total_seconds"),
            (amt / (F.col("secs").cast("double") / 3600)).alias("average_per_hour"),
            F.when(F.col("transmissionType") == "Toy", "#21619A")
            .when(F.col("transmissionType") == "Privada", "#EB933D")
            .when(F.col("transmissionType") == "Total", "#219E0D")
            .otherwise("#000000")
            .alias("color"),
        )
        .orderBy(
            F.when(F.col("id") == "Total", 1)
            .when(F.col("id") == "Privada", 2)
            .when(F.col("id") == "Toy", 3)
            .otherwise(4)
        )
    )


# ---------------------------------------------------------------------------
# 4. totalProfitReport — total-earnings gauge (totalProfitReport.py)
# ---------------------------------------------------------------------------


def total_profit_report(
    users: DataFrame,
    jasmin: DataFrame,
    streamate: DataFrame,
    start_date: str,
    end_date: str,
    locations: Optional[list[dict]] = None,
    user_selected: Optional[str] = None,
    platform: Optional[str] = None,
) -> DataFrame:
    """Total profit per transmission type (totalProfitReport.py:81-105):
    BASE LEFT JOIN per-office sums labeled 'Total' → Toy/Privada rows kept
    with value 0 (the zero-default semantics of §2.13)."""
    _validate_dates(start_date, end_date)
    cond = location_filter(locations, user_selected)
    u = F.broadcast(_apply(users, cond).select("_id", "office"))
    perf = _dated(_perf_union(jasmin, streamate, platform)).join(u, "_id")
    per_office = (
        perf.filter(F.col("d").between(F.lit(start_date), F.lit(end_date)))
        .groupBy("office")
        .agg(sum_micros(F.coalesce(F.col("total_earnings"), F.lit(0.0))).alias("m"))
        .select(F.lit("Total").alias("transmissionType"), "m")
    )
    from data_lake_spark.functions.localframe import values_df

    base = values_df(
        users.sparkSession,
        [("Toy",), ("Privada",), ("Total",)],
        "transmissionType string",
    )
    # broadcast the aggregate (right/build) side — a hint on the
    # preserved side of a left join is silently dropped by Spark
    return (
        base.join(F.broadcast(per_office), "transmissionType", "left")
        .groupBy("transmissionType")
        .agg(F.coalesce(F.sum("m"), F.lit(0)).alias("m_sum"))
        .select(
            F.col("transmissionType").alias("id"),
            F.col("transmissionType").alias("label"),
            micros_to_amount(F.col("m_sum")).alias("value"),
            F.when(F.col("transmissionType") == "Toy", "#21619A")
            .when(F.col("transmissionType") == "Privada", "#EB933D")
            .when(F.col("transmissionType") == "Total", "#219E0D")
            .otherwise("#000000")
            .alias("color"),
        )
        .orderBy(
            F.when(F.col("id") == "Total", 1)
            .when(F.col("id") == "Privada", 2)
            .when(F.col("id") == "Toy", 3)
            .otherwise(4)
        )
    )


# ---------------------------------------------------------------------------
# 5. profitAvg — average per-office earnings (profitAvg.py)
# ---------------------------------------------------------------------------


def profit_avg(
    users: DataFrame,
    earnings_by_performer: DataFrame,
    start_date: str,
    end_date: str,
    locations: Optional[list[dict]] = None,
) -> DataFrame:
    """AVG over per-office sums with the disjunctive OR-join
    (profitAvg.py:74-89: emailaddress = streamateuser OR jasminuser).

    Spark-first: the OR-join is rewritten as a UNION of two equi-joins
    (SURVEY J4) — the join conditions are disjoint (an email matches one
    platform column), so no pair dedup is needed and both joins stay
    broadcast-able."""
    _validate_dates(start_date, end_date)
    cond = location_filter(locations)
    u = F.broadcast(_apply(users, cond))
    eap = earnings_by_performer.withColumn("d", F.to_date("date")).filter(
        F.col("d").between(F.lit(start_date), F.lit(end_date))
    )
    j1 = eap.join(u, eap.emailaddress == u.streamateuser)
    j2 = eap.join(u, eap.emailaddress == u.jasminuser)
    matched = j1.select("office", "payableamount").unionByName(
        j2.select("office", "payableamount")
    )
    per_office = (
        matched.groupBy("office")
        .agg(sum_micros(F.coalesce(F.col("payableamount"), F.lit(0.0))).alias("m"))
        .select(F.lit("Otros").alias("transmissionType"), "m")
    )
    from data_lake_spark.functions.localframe import values_df

    base = values_df(
        users.sparkSession,
        [("Toy",), ("Privada",), ("Otros",)],
        "transmissionType string",
    )
    # broadcast the aggregate (right/build) side — a hint on the
    # preserved side of a left join is silently dropped by Spark
    return (
        base.join(F.broadcast(per_office), "transmissionType", "left")
        .groupBy("transmissionType")
        .agg(
            F.coalesce(
                micros_to_amount(F.sum("m")) / F.count("m"), F.lit(0.0)
            ).alias("value")
        )
        .select(
            F.col("transmissionType").alias("id"),
            F.col("transmissionType").alias("label"),
            "value",
            F.when(F.col("transmissionType") == "Toy", "#BD0909")
            .when(F.col("transmissionType") == "Privada", "#EB8326")
            .when(F.col("transmissionType") == "Otros", "#C9370F")
            .otherwise("#000000")
            .alias("color"),
        )
        .orderBy(
            F.when(F.col("id") == "Toy", 1)
            .when(F.col("id") == "Privada", 2)
            .when(F.col("id") == "Otros", 3)
            .otherwise(4)
        )
    )


# ---------------------------------------------------------------------------
# 6. models_earning_distribution — top-5 + 'General' (models_earning_distribution.py)
# ---------------------------------------------------------------------------


def models_earning_distribution(
    users: DataFrame,
    jasmin: DataFrame,
    streamate: DataFrame,
    start_date: str,
    end_date: str,
    locations: Optional[list[dict]] = None,
    user_selected: Optional[str] = None,
    platform: Optional[str] = None,
    sort_key: str = "DESC",
) -> DataFrame:
    """Artist earnings distribution (models_earning_distribution.py:85-139):
    rank by summed earnings, keep top-5, relabel the tail 'General'
    (attrs blanked), re-aggregate, add percentage-of-total. The
    reference's ROUND-then-SUM is carried as exact integer cents so the
    re-aggregation stays order-independent."""
    _validate_dates(start_date, end_date)
    if sort_key not in ("ASC", "DESC"):
        raise ValueError('sort_key must be "ASC" or "DESC"')
    cond = location_filter(locations, user_selected)
    u = F.broadcast(
        _apply(users, cond).select("_id", "artisticname", "picture", "city", "office")
    )
    perf = _dated(_perf_union(jasmin, streamate, platform))
    ranked = (
        perf.filter(F.col("d").between(F.lit(start_date), F.lit(end_date)))
        .join(u, "_id")
        .groupBy("artisticname")
        .agg(
            F.max("picture").alias("picture"),
            F.max("city").alias("city"),
            F.max("office").alias("office"),
            sum_micros("total_earnings").alias("m"),
        )
        .withColumn("c", cents(micros_to_amount(F.col("m"))))  # ROUND(...,2) as cents
    )
    # Top-5 membership via TakeOrderedAndProject (no single-reducer
    # window): the aggregate is checkpointed once, the 5 survivors come
    # back as a broadcast probe. Scales with the artist dimension.
    ranked = ranked.localCheckpoint(eager=False)
    order = F.col("m").asc() if sort_key == "ASC" else F.col("m").desc()
    top5 = rk_top_k(ranked, [order, F.col("artisticname").asc()], 5).select(
        "artisticname", F.lit(True).alias("_top")
    )
    in_top = F.col("_top").isNotNull() & F.col("_top")
    relabeled = ranked.join(F.broadcast(top5), "artisticname", "left").select(
        F.when(in_top, F.col("artisticname")).otherwise("General").alias("artisticname"),
        F.when(in_top, F.col("picture")).otherwise("").alias("picture"),
        F.when(in_top, F.col("city")).otherwise("").alias("city"),
        F.when(in_top, F.col("office")).otherwise("").alias("office"),
        "c",
    )
    regrouped = relabeled.groupBy("artisticname").agg(
        F.max("picture").alias("picture"),
        F.max("city").alias("city"),
        F.max("office").alias("office"),
        F.sum("c").alias("c2"),
    )
    total = regrouped.agg(F.sum("c2").alias("_tot_c"))
    out_order = (
        F.col("total_earnings").asc() if sort_key == "ASC" else F.col("total_earnings").desc()
    )
    return (
        with_broadcast_scalar(regrouped, total)
        .select(
            "artisticname",
            "picture",
            "city",
            "office",
            (F.col("c2").cast("double") / 100).alias("total_earnings"),
            round2(
                (F.col("c2").cast("double") / 100)
                / (F.col("_tot_c").cast("double") / 100)
                * 100
            ).alias("percentage"),
        )
        .orderBy(out_order)
    )


# ---------------------------------------------------------------------------
# 7. earningsByDayOfWeek — weekday distribution (earningsByDayOfWeek.py)
# ---------------------------------------------------------------------------

_DOW_LABELS = ["Lun", "Mar", "Mié", "Jue", "Vie", "Sáb", "Dom"]  # 1..7 ISO


def earnings_by_day_of_week(
    users: DataFrame,
    jasmin: DataFrame,
    streamate: DataFrame,
    start_date: str,
    end_date: str,
    locations: Optional[list[dict]] = None,
    user_selected: Optional[str] = None,
    platform: Optional[str] = None,
) -> DataFrame:
    """Earnings by ISO weekday (earningsByDayOfWeek.py:92-162): total,
    average per active day, and percentage of the summed per-day averages,
    Sunday-first. The Presto day_of_week numbering shift is handled by
    dow_presto; the rounded-average re-sum is carried as exact cents."""
    _validate_dates(start_date, end_date)
    cond = location_filter(locations)
    u = F.broadcast(_apply(users, cond).select("_id"))
    perf = _dated(_perf_union(jasmin, streamate, platform))
    combined = perf.filter(
        F.col("d").between(F.lit(start_date), F.lit(end_date))
    ).join(u, "_id")
    if user_selected:
        combined = combined.filter(F.col("_id") == user_selected)
    grouped = combined.groupBy(dow_presto("d").alias("day_number")).agg(
        sum_micros("total_earnings").alias("m"),
        F.countDistinct("d").alias("active_days"),
    ).localCheckpoint(eager=False)
    amt = micros_to_amount(F.col("m"))
    avg_c = cents(amt / F.col("active_days"))  # ROUND(sum/days, 2) as cents
    # percentage denominator as a broadcast scalar aggregate over the
    # checkpointed 7-row frame — no partition-less window stage
    total = grouped.select(avg_c.alias("_avg_c")).agg(
        F.sum("_avg_c").alias("_tot_avg_c")
    )
    scored = with_broadcast_scalar(grouped, total).select(
        "day_number",
        round2(amt).alias("total"),
        (avg_c.cast("double") / 100).alias("average_per_day"),
        round2(
            (avg_c.cast("double") / 100)
            / (F.col("_tot_avg_c").cast("double") / 100)
            * 100
        ).alias("percentage"),
    )
    label = F.element_at(F.array(*[F.lit(x) for x in _DOW_LABELS]), F.col("day_number").cast("int"))
    return (
        scored.select(
            label.alias("dow"), "total", "average_per_day", "percentage", "day_number"
        )
        .orderBy(F.when(F.col("day_number") == 7, 1).otherwise(F.col("day_number") + 1))
        .drop("day_number")
    )


# ---------------------------------------------------------------------------
# 8. detailedRanking — per-model platform comparison (detailedRanking.py)
# ---------------------------------------------------------------------------


def detailed_ranking(
    users: DataFrame,
    jasmin: DataFrame,
    streamate: DataFrame,
    start_date: str,
    end_date: str,
    locations: Optional[list[dict]] = None,
    page: int = 1,
    limit: int = 10,
) -> DataFrame:
    """Per-model jasmin⟗streamate comparison (detailedRanking.py:88-138)
    with the Python post-processing folded in: drop rows where both
    platforms are zero (detailedRanking.py:220-221) and paginate in the
    engine (offset/limit on a deterministic sort) instead of client-side
    slicing (detailedRanking.py:223-235)."""
    _validate_dates(start_date, end_date)
    cond = location_filter(locations)
    u = F.broadcast(
        _apply(users, cond).select(
            "_id", "artisticname", "city", "office", "room", "picture"
        )
    )

    def side(perf: DataFrame, label: str) -> DataFrame:
        return (
            _dated(perf)
            .filter(F.col("d").between(F.lit(start_date), F.lit(end_date)))
            .join(u, "_id")
            .groupBy("_id", "artisticname", "city", "office", "room", "picture")
            .agg(
                sum_micros("total_earnings").alias(f"{label}_m"),
                F.sum(F.col("online_seconds").cast("long")).alias(f"{label}_time"),
            )
        )

    jd, sd = side(jasmin, "jasmin"), side(streamate, "streamate")
    joined = jd.alias("jd").join(
        sd.alias("sd"), F.col("jd._id") == F.col("sd._id"), "full_outer"
    )
    j_amt = micros_to_amount(F.coalesce(F.col("jd.jasmin_m"), F.lit(0)))
    s_amt = micros_to_amount(F.coalesce(F.col("sd.streamate_m"), F.lit(0)))
    total = j_amt + s_amt
    flat = joined.select(
        F.coalesce(F.col("jd._id"), F.col("sd._id")).alias("_id"),
        F.coalesce(F.col("jd.artisticname"), F.col("sd.artisticname")).alias(
            "artisticname"
        ),
        F.coalesce(F.col("jd.city"), F.col("sd.city")).alias("city"),
        F.coalesce(F.col("jd.office"), F.col("sd.office")).alias("office"),
        F.coalesce(F.col("jd.room"), F.col("sd.room")).alias("room"),
        F.col("jd.picture").alias("picture"),
        j_amt.alias("jasmin_sales"),
        F.coalesce(F.col("jd.jasmin_time"), F.lit(0)).alias("jasmin_time"),
        s_amt.alias("streamate_sales"),
        F.coalesce(F.col("sd.streamate_time"), F.lit(0)).alias("streamate_time"),
        round2(j_amt / total * 100).alias("jasmin_percentage"),
        round2(s_amt / total * 100).alias("streamate_percentage"),
        total.alias("total_sales"),
    )
    return (
        flat.filter((F.col("jasmin_sales") > 0) | (F.col("streamate_sales") > 0))
        .orderBy(F.col("total_sales").desc(), F.col("artisticname").asc())
        .offset((page - 1) * limit)
        .limit(limit)
    )


def detailed_ranking_nested(*args, **kwargs) -> DataFrame:
    """The §2.13 reshape: flat ranking row → nested
    {model:{...}, jasmin:{...}, streamate:{...}} structs
    (detailedRanking.py:194-218)."""
    flat = detailed_ranking(*args, **kwargs)
    return flat.select(
        F.struct("_id", "artisticname", "city", "office", "room", "picture").alias(
            "model"
        ),
        F.struct(
            F.col("jasmin_sales").alias("sales"),
            F.col("jasmin_time").alias("time"),
            F.col("jasmin_percentage").alias("percentage"),
        ).alias("jasmin"),
        F.struct(
            F.col("streamate_sales").alias("sales"),
            F.col("streamate_time").alias("time"),
            F.col("streamate_percentage").alias("percentage"),
        ).alias("streamate"),
        "total_sales",
    )
