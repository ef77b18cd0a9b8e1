"""Serving-layer input validation (reference §3.1 step 2): malformed
request params fail fast with ValueError before any Spark work, exactly
like the lambdas' strptime/whitelist guards (earnings.py:22-49,
models_earning_distribution.py:54-59)."""

from __future__ import annotations

import pytest

from data_lake_spark.api import endpoints


def _dims(spark):
    users = spark.createDataFrame(
        [("u1", "off1", "city1", "a@x.com", "j1", "art1", "room1", "pic")],
        "_id string, officeName string, cityName string, streamateUser string,"
        " jasminUser string, artisticname string, room string, picture string",
    )
    perf = spark.createDataFrame(
        [("u1", "2024-01-01", "10.0", "3600")],
        "_id string, date string, total_earnings string, online_seconds string",
    )
    return users, perf


def test_bad_date_rejected(spark):
    users, perf = _dims(spark)
    with pytest.raises(ValueError):
        endpoints.earnings(users, perf, perf, start_date="01/02/2024")
    with pytest.raises(ValueError):
        endpoints.needle(users, perf, perf, "2024-01-01", "not-a-date")


def test_bad_sort_key_rejected(spark):
    users, perf = _dims(spark)
    with pytest.raises(ValueError):
        endpoints.models_earning_distribution(
            users, perf, perf, "2024-01-01", "2024-02-01", sort_key="SIDEWAYS"
        )


def test_good_params_pass_validation(spark):
    users, perf = _dims(spark)
    out = endpoints.earnings(users, perf, perf, start_date="2024-01-01")
    assert out.count() >= 1
