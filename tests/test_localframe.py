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


def test_property_values_df_equals_createdataframe(spark):
    # hypothesis: for arbitrary scalar rows, values_df and
    # createDataFrame agree on schema and values (incl. NULLs, quotes,
    # backslashes, unicode, extreme doubles)
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_lake_spark.functions.localframe import values_df

    cell_s = st.one_of(st.none(), st.text(max_size=12))
    cell_l = st.one_of(
        st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)
    )
    cell_d = st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    )
    rows = st.lists(st.tuples(cell_l, cell_s, cell_d), min_size=1, max_size=6)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=rows)
    def check(rows):
        ddl = "a long, b string, c double"
        got = values_df(spark, rows, ddl)
        want = spark.createDataFrame(rows, ddl)
        assert got.schema == want.schema
        import struct as _s

        def canon(rs):
            out = []
            for r in rs:
                c = r[2]
                out.append(
                    (r[0], r[1], None if c is None else _s.pack("<d", c))
                )
            return sorted(out, key=str)

        assert canon(map(tuple, got.collect())) == canon(
            map(tuple, want.collect())
        )

    check()


def test_non_finite_doubles(spark):
    # inf/nan weights from a divergent training run must round-trip,
    # not throw unresolved-identifier AnalysisExceptions (bare repr()
    # would emit CAST(inf AS DOUBLE) and resolve 'inf' as a column)
    from data_lake_spark.functions.localframe import values_df

    rows = [
        (1, float("inf")),
        (2, float("-inf")),
        (3, float("nan")),
        (4, 1.5),
    ]
    got = {r["k"]: r["v"] for r in values_df(spark, rows, "k int, v double").collect()}
    assert got[1] == float("inf") and got[2] == float("-inf")
    assert got[3] != got[3]  # nan
    assert got[4] == 1.5


def test_legacy_escaped_string_literals_mode(spark):
    # round-9 advice: with the legacy raw-literal parser config the old
    # backslash-escaped rendering silently doubled every backslash
    from data_lake_spark.functions.localframe import values_df

    rows = [
        (1, r"a\b"),
        (2, r"c\\d"),
        (3, "it's"),
        (4, "mix\\'n\"all"),
        (5, "tab\tnew\nünïcode"),
        (6, ""),
    ]
    ddl = "k long, s string"
    want = [tuple(r) for r in spark.createDataFrame(rows, ddl).collect()]
    key = "spark.sql.parser.escapedStringLiterals"
    old = spark.conf.get(key, "false")
    try:
        for mode in ("false", "true"):
            spark.conf.set(key, mode)
            got = [tuple(r) for r in values_df(spark, rows, ddl).collect()]
            assert sorted(got) == sorted(want), mode
    finally:
        spark.conf.set(key, old)


def test_parameterized_decimal_type(spark):
    # round-9 advice: the bare comma split broke decimal(10,2) into two
    # fields; the depth-aware split keeps parameterized scalars whole
    from decimal import Decimal

    from data_lake_spark.functions.localframe import values_df

    ddl = "k long, amt decimal(10,2), s string"
    rows = [(1, Decimal("12.50"), "x"), (2, None, "y"), (3, Decimal("-0.01"), None)]
    got = values_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )
