"""As-of join semantics: backward match, equal-ts inclusion, null when no
right row precedes, and partition-order insensitivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.operators.asof import asof_join_backward


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (1, 7, 70.0), (2, 5, 50.0)],
        "k long, ts long, lv double",
    )
    right = spark.createDataFrame(
        [(1, 8, 1.0), (1, 15, 2.0), (1, 20, 3.0), (3, 1, 9.0)],
        "k long, ts long, rv double",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _fixture(spark)
    out = {
        (r.k, r.ts): (r.asof_ts, r.asof_rv)
        for r in asof_join_backward(
            left, right, on=["k"], ts_col="ts", value_cols=["rv"]
        ).collect()
    }
    assert out[(1, 10)] == (8, 1.0)   # most recent prior
    assert out[(1, 20)] == (20, 3.0)  # equal ts matches
    assert out[(1, 7)] == (None, None)  # nothing precedes
    assert out[(2, 5)] == (None, None)  # key absent on right
    assert len(out) == 4  # left rows preserved exactly


def test_asof_partition_insensitive(spark):
    left, right = _fixture(spark)
    a = sorted(
        asof_join_backward(left, right, ["k"], "ts", ["rv"]).collect()
    )
    b = sorted(
        asof_join_backward(
            left.repartition(7), right.repartition(3), ["k"], "ts", ["rv"]
        ).collect()
    )
    assert a == b
