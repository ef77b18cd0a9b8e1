"""Presto↔Spark date-function parity (functions/dates.py) against an
independent oracle: Python's datetime.isocalendar(). SURVEY §7 risk (a)
calls out exactly these edges — the dow shift and ISO-week behavior at
year boundaries."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_lake_spark.functions.dates import dow_presto, week_presto

# the classic ISO-week traps: week 53 years, Jan 1 belonging to the
# previous ISO year, Dec 30/31 belonging to week 1 of the next
_EDGES = [
    "2015-12-28",  # Monday of week 53/2015
    "2016-01-01",  # Friday, ISO week 53 of 2015
    "2016-01-04",  # Monday, week 1 of 2016
    "2020-12-31",  # Thursday, week 53 of 2020
    "2021-01-01",  # Friday, still week 53 of 2020
    "2024-12-30",  # Monday, week 1 of 2025
    "2024-12-29",  # Sunday, week 52 of 2024
    "1970-01-01",  # Thursday, week 1
    "2000-02-29",  # leap day
]


def _check(spark, dates: list[str]) -> None:
    df = spark.createDataFrame([(d,) for d in dates], "d string")
    got = {
        r.d: (r.dow, r.wk)
        for r in df.select(
            "d",
            dow_presto(F.to_date("d")).alias("dow"),
            week_presto(F.to_date("d")).alias("wk"),
        ).collect()
    }
    for d in dates:
        iso = dt.date.fromisoformat(d).isocalendar()
        assert got[d] == (iso[2], iso[1]), (d, got[d], (iso[2], iso[1]))


def test_known_edge_dates(spark):
    _check(spark, _EDGES)


@given(
    ordinals=st.lists(
        st.integers(
            dt.date(1990, 1, 1).toordinal(), dt.date(2035, 12, 31).toordinal()
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_dates_match_isocalendar(spark, ordinals):
    _check(spark, [dt.date.fromordinal(o).isoformat() for o in ordinals])
