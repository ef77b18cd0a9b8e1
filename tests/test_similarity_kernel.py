"""similarity.pair_dot_exact (round-10 Arrow kernel) vs dot_exact (the
zip_with+aggregate lambda form): bit-identical quantized dot products,
including negative components, nulls, and ragged/empty vectors (which
take the kernel's row-wise fallback)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.operators.similarity import dot_exact, pair_dot_exact

_PAIRS = [
    (0, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    (1, [0.1, -0.2, 0.33], [-0.7, 0.0001, 12.5]),
    (2, [1e-7, 2e-7, -3e-7], [5.0, -6.0, 7.0]),
    (3, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
]


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "pid long, a array<double>, b array<double>"
    )


def test_kernel_matches_lambda_dot(spark):
    df = _frame(spark, _PAIRS)
    # the lambda form's RAW long sum (dot_exact divides it by 1e12 into
    # a double; multiplying back would cost an ulp and test nothing)
    prods = F.zip_with(
        F.col("a"), F.col("b"), lambda x, y: F.floor(x * y * F.lit(1e12))
    )
    lam = {
        r["pid"]: r["d"]
        for r in df.select(
            "pid",
            F.aggregate(
                prods, F.lit(0).cast("long"), lambda acc, p: acc + p
            ).alias("d"),
        ).collect()
    }
    ker = {
        r["pid"]: r["_dq"]
        for r in pair_dot_exact(df, "a", "b").select("pid", "_dq").collect()
    }
    assert ker == lam


def test_kernel_null_and_empty_fallback(spark):
    rows = [
        (0, None, [1.0, 2.0]),
        (1, [1.0, 2.0], None),
        (2, [], []),
        (3, [2.0, 3.0], [4.0, 5.0]),
    ]
    df = _frame(spark, rows)
    out = {
        r["pid"]: r["_dq"]
        for r in pair_dot_exact(df, "a", "b").select("pid", "_dq").collect()
    }
    assert out[0] is None and out[1] is None
    assert out[2] == 0
    assert out[3] == int(2.0 * 4.0 * 1e12) + int(3.0 * 5.0 * 1e12)


def test_kernel_passthrough_columns_and_row_count(spark):
    df = _frame(spark, _PAIRS).withColumn("tag", F.col("pid") * 10)
    out = pair_dot_exact(df, "a", "b").collect()
    assert sorted((r["pid"], r["tag"]) for r in out) == [
        (p[0], p[0] * 10) for p in _PAIRS
    ]
