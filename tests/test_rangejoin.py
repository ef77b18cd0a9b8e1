"""Banded range join: equivalent to the brute-force inequality join,
each pair emitted once, and planned as an equi-join (no nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.operators.rangejoin import band_join


def _sides(spark):
    left = spark.range(0, 300).select(
        F.col("id").alias("lid"), (F.col("id") % 97 * 1.37).alias("lv")
    )
    right = spark.range(0, 300).select(
        F.col("id").alias("rid"), (F.col("id") % 89 * 1.41).alias("rv")
    )
    return left, right


def test_band_join_matches_bruteforce(spark):
    left, right = _sides(spark)
    eps = 0.75
    got = sorted(
        (r.lid, r.rid) for r in band_join(left, right, "lv", "rv", eps).collect()
    )
    want = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter(F.abs(F.col("lv") - F.col("rv")) <= eps)
        .collect()
    )
    assert got == want
    assert len(got) == len(set(got))  # no duplicate pairs


def test_band_join_is_equi_join(spark):
    left, right = _sides(spark)
    plan = band_join(left, right, "lv", "rv", 0.5)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_interval_join_matches_bruteforce(spark):
    from data_lake_spark.operators.rangejoin import interval_join

    left = spark.range(0, 200).select(
        F.col("id").alias("lid"),
        (F.col("id") * 37 % 1000).alias("ls"),
        (F.col("id") * 37 % 1000 + F.col("id") % 90).alias("le"),
    )
    right = spark.range(0, 200).select(
        F.col("id").alias("rid"),
        (F.col("id") * 53 % 1000).alias("rs"),
        (F.col("id") * 53 % 1000 + F.col("id") % 70).alias("re"),
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            left, right, "ls", "le", "rs", "re", chunk=64
        ).collect()
    )
    want = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    # exact same pair multiset: nothing missed, nothing duplicated by
    # pairs meeting in several chunks (the canonical-chunk trick)
    assert got == want


def test_interval_join_exact_once_wide_intervals(spark):
    # intervals spanning many chunks must still emit each pair once
    from data_lake_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame([(1, 0, 500), (2, 100, 900)], "lid long, ls long, le long")
    right = spark.createDataFrame([(10, 450, 460), (11, 0, 1000)], "rid long, rs long, re long")
    rows = interval_join(left, right, "ls", "le", "rs", "re", chunk=16).collect()
    pairs = sorted((r.lid, r.rid) for r in rows)
    assert pairs == [(1, 10), (1, 11), (2, 10), (2, 11)]
