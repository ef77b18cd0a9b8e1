"""Property-based checks (hypothesis) for the invariants the engine's
correctness story rests on:

- exact sums are partition-order independent: any repartitioning of the
  same rows yields the bit-identical aggregate (the property that makes
  results stable from local[32] to 1000 executors);
- the Spark exact-sum matches the DuckDB oracle mirror on arbitrary
  money-like inputs;
- keep-latest dedup is idempotent and insensitive to input order.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lake_spark.functions.exact import oracle_sum_exact, sum_exact

MONEY = st.decimals(
    min_value="-99999.99", max_value="99999.99", places=2
).map(float)

# each example runs real Spark jobs (~0.5 s); a handful per property is
# the right cost/coverage trade in a suite that runs every round
_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(MONEY, min_size=1, max_size=60), parts=st.integers(1, 8))
@settings(**_SETTINGS)
def test_sum_exact_partition_order_independent(spark, vals, parts):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    a = df.coalesce(1).agg(sum_exact("x").alias("s")).collect()[0]["s"]
    b = df.repartition(parts).agg(sum_exact("x").alias("s")).collect()[0]["s"]
    assert a == b  # bit-identical, not approx


@given(vals=st.lists(MONEY, min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_sum_exact_matches_duckdb_oracle(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(sum_exact("x").alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(f"SELECT {oracle_sum_exact('x')} FROM t").fetchone()[0]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10), MONEY),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_keep_latest_idempotent_and_order_insensitive(spark, rows):
    from data_lake_spark.operators.upsert import keep_latest

    df = spark.createDataFrame(rows, "k int, ver int, val double")
    once = keep_latest(df, keys=["k"], order_col="ver", tiebreak=["val"])
    twice = keep_latest(once, keys=["k"], order_col="ver", tiebreak=["val"])
    got_once = sorted(once.collect())
    assert got_once == sorted(twice.collect())
    shuffled = keep_latest(df.repartition(5), keys=["k"], order_col="ver", tiebreak=["val"])
    assert got_once == sorted(shuffled.collect())
    # exactly one survivor per key
    assert once.groupBy("k").count().filter("count > 1").count() == 0
