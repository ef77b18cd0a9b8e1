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
