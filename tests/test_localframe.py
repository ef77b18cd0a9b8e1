"""values_df: literal VALUES frames replacing small createDataFrame
calls (no parallelize job) — schema fidelity, round-trip exactness,
escaping, NULLs, empties."""

from __future__ import annotations

import pytest


def test_schema_and_values_match_createdataframe(spark):
    from data_lake_spark.functions.localframe import values_df

    ddl = "a long, b string, c double, d boolean, e int"
    rows = [
        (1, "x", 0.1, True, 7),
        (2, "it's", -1.5e-300, False, None),
        (None, None, None, None, 0),
    ]
    got = values_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_doubles_roundtrip_bit_exact(spark):
    from data_lake_spark.functions.localframe import values_df
    import struct

    vals = [0.1 + 0.2, 1 / 3, 2**-1074, 1.7976931348623157e308]
    rows = [(i, v) for i, v in enumerate(vals)]
    got = {r["i"]: r["v"] for r in values_df(spark, rows, "i int, v double").collect()}
    for i, v in enumerate(vals):
        assert struct.pack("<d", got[i]) == struct.pack("<d", v)


def test_escaping_and_no_job(spark):
    from data_lake_spark.functions.localframe import values_df

    rows = [(1, "a'b\\c"), (2, "plain")]
    got = {r["k"]: r["s"] for r in values_df(spark, rows, "k int, s string").collect()}
    assert got == {1: "a'b\\c", 2: "plain"}
    # a VALUES frame is a LocalRelation — no scan, no exchange
    plan = values_df(spark, rows, "k int, s string")._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan


def test_empty_and_errors(spark):
    from data_lake_spark.functions.localframe import values_df

    assert values_df(spark, [], "a long, b string").count() == 0
    with pytest.raises(ValueError):
        values_df(spark, [(1,)], "a array<long>")
    with pytest.raises(ValueError):
        values_df(spark, [(1, 2)], "a long")
    with pytest.raises(TypeError):
        values_df(spark, [([1],)], "a long")
