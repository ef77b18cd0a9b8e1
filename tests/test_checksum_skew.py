"""Table checksums (functions/checksum.py) and skew diagnosis
(operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.checksum import table_checksum, tables_equal
from data_lake_spark.operators.skew import key_skew_report, suggest_salt_factor


def test_checksum_partition_and_order_independent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = table_checksum(li)
    b = table_checksum(li.repartition(13))
    c = table_checksum(li.orderBy(F.desc("l_extendedprice")))
    assert a == b == c
    assert a["n_rows"] == li.count()


def test_checksum_detects_any_difference(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    assert tables_equal(li, li.repartition(7))
    # drop one row
    first = li.first()
    assert not tables_equal(
        li, li.filter(F.col("l_orderkey") != first["l_orderkey"])
    )
    # mutate one value in one row
    mutated = li.withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") == first["l_orderkey"])
            & (F.col("l_linenumber") == first["l_linenumber"]),
            F.col("l_quantity") + 1,
        ).otherwise(F.col("l_quantity")),
    )
    assert not tables_equal(li, mutated)


def test_checksum_column_order_irrelevant(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "i int, s string")
    b = spark.createDataFrame([("y", 2), ("x", 1)], "s string, i int")
    assert tables_equal(a, b)


def test_checksum_null_vs_empty(spark):
    a = spark.createDataFrame([(1, None)], "i int, s string")
    b = spark.createDataFrame([(1, "")], "i int, s string")
    assert not tables_equal(a, b)


def test_checksum_null_vs_sentinel_like_string(spark):
    """NULL is hashed via an out-of-band indicator, so no string VALUE —
    including the old in-band '\\x00null' sentinel — can collide with it."""
    a = spark.createDataFrame([(1, None)], "i int, s string")
    b = spark.createDataFrame([(1, "\x00null")], "i int, s string")
    assert not tables_equal(a, b)


def test_skew_report_uniform_and_skewed(spark):
    uniform = spark.range(0, 10_000).withColumn("k", F.col("id") % 100)
    rep = key_skew_report(uniform, "k", top_k=3).collect()
    assert all(abs(r["skew_ratio"] - 1.0) < 0.01 for r in rep)
    assert suggest_salt_factor(uniform, "k") == 1

    skewed = spark.range(0, 10_000).withColumn(
        "k", F.when(F.col("id") < 5_000, 0).otherwise(F.col("id") % 100)
    )
    rep = key_skew_report(skewed, "k", top_k=3).collect()
    assert rep[0]["key_value"] == "0"
    assert rep[0]["row_share"] > 0.49
    assert rep[0]["skew_ratio"] > 10
    assert suggest_salt_factor(skewed, "k") > 1


def test_skew_report_on_real_fact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rep = key_skew_report(li, "l_orderkey", top_k=5)
    rows = rep.collect()
    assert len(rows) == 5
    # lineitem per-order multiplicity is bounded — near-uniform at any SF
    assert rows[0]["skew_ratio"] < 10


# --- property-based ---------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ROW = st.tuples(
    st.integers(-1000, 1000),
    st.one_of(st.none(), st.text(alphabet="abc\x00", max_size=4)),
)


@given(rows=st.lists(_ROW, min_size=1, max_size=40), parts=st.integers(1, 7))
@settings(**_SETTINGS)
def test_checksum_is_multiset_invariant(spark, rows, parts):
    import random

    df = spark.createDataFrame(rows, "i long, s string")
    shuffled = list(rows)
    random.Random(42).shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "i long, s string").repartition(parts)
    from data_lake_spark.functions.checksum import table_checksum

    assert table_checksum(df) == table_checksum(df2)


@given(rows=st.lists(_ROW, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_checksum_detects_single_row_removal(spark, rows):
    from data_lake_spark.functions.checksum import table_checksum

    df = spark.createDataFrame(rows, "i long, s string")
    fewer = spark.createDataFrame(rows[1:], "i long, s string") if len(rows) > 1 else None
    a = table_checksum(df)
    assert a["n_rows"] == len(rows)
    if fewer is not None:
        assert table_checksum(fewer) != a
