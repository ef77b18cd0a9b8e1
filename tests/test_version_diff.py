"""versioned.version_diff: Delta-CDF-style change feed between
snapshots — classification, the diff→apply reconciliation round-trip,
and partitioning determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_spark.functions.checksum import table_checksum
from data_lake_spark.versioned import (
    apply_changes,
    version_diff,
    write_version,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vdiff"))
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)],
        "id long, name string, amount double",
    )
    write_version(v1, root)
    # v2: id=1 unchanged, id=2 updated, id=3 deleted, id=5 inserted,
    # id=4 null→value (null-safe hash must see this as an update)
    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (5, "e", 50.0), (4, "d", 40.0)],
        "id long, name string, amount double",
    )
    write_version(v2, root)
    return root


def test_change_classification(spark, table):
    feed = version_diff(spark, table, ["id"], v_from=1, v_to=2)
    got = {
        (r["id"], r["_change_type"]): (r["name"], r["amount"])
        for r in feed.collect()
    }
    assert got == {
        (2, "update_preimage"): ("b", 20.0),
        (2, "update_postimage"): ("b", 25.0),
        (4, "update_preimage"): ("d", None),
        (4, "update_postimage"): ("d", 40.0),
        (3, "delete"): ("c", 30.0),
        (5, "insert"): ("e", 50.0),
    }
    # unchanged row 1 absent; schema = table schema + _change_type
    assert feed.columns == ["id", "name", "amount", "_change_type"]


def test_apply_reproduces_target_snapshot(spark, table):
    from data_lake_spark.versioned import read_version

    feed = version_diff(spark, table, ["id"], v_from=1, v_to=2)
    replayed = apply_changes(
        spark, read_version(spark, table, 1), feed, ["id"]
    )
    assert table_checksum(replayed) == table_checksum(
        read_version(spark, table, 2)
    )


def test_empty_diff_between_identical_versions(spark, table):
    assert version_diff(spark, table, ["id"], v_from=2, v_to=2).count() == 0


def test_diff_deterministic_across_partitionings(spark, table):
    a = version_diff(spark, table, ["id"], v_from=1, v_to=2)
    b = version_diff(spark, table, ["id"], v_from=1, v_to=2).repartition(13)
    assert table_checksum(a) == table_checksum(b)


def test_schema_mismatch_raises(spark, table, tmp_path):
    root = str(tmp_path / "t2")
    write_version(
        spark.createDataFrame([(1, "x")], "id long, name string"), root
    )
    write_version(
        spark.createDataFrame([(1, 2.0)], "id long, other double"), root
    )
    with pytest.raises(ValueError, match="matching schemas"):
        version_diff(spark, root, ["id"], v_from=1, v_to=2)


def test_key_only_table_all_value_columns_empty(spark, tmp_path):
    # a pure key set: every change is insert/delete, never update
    root = str(tmp_path / "t3")
    write_version(spark.createDataFrame([(1,), (2,)], "id long"), root)
    write_version(spark.createDataFrame([(2,), (3,)], "id long"), root)
    feed = version_diff(spark, root, ["id"], v_from=1, v_to=2)
    got = {(r["id"], r["_change_type"]) for r in feed.collect()}
    assert got == {(1, "delete"), (3, "insert")}


# ---------------------------------------------------------------------------
# maintain_aggregate — CDC-driven materialized-view maintenance
# ---------------------------------------------------------------------------


def _recompute(df):
    from data_lake_spark.functions.exact import sum_micros

    return df.groupBy("name").agg(
        sum_micros(F.col("amount")).alias("value_u"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def test_maintained_aggregate_matches_recompute(spark, tmp_path):
    from data_lake_spark.versioned import (
        maintain_aggregate,
        read_version,
        version_diff,
        write_version,
    )

    root = str(tmp_path / "mv")
    v1 = spark.createDataFrame(
        [(1, "a", 10.5), (2, "a", 1.25), (3, "b", 30.0), (4, "c", 7.0)],
        "id long, name string, amount double",
    )
    write_version(v1, root)
    # updates (2: 1.25->2.75), deletes (4 — group c VANISHES), inserts
    # (5 into new group d), unchanged (1, 3)
    v2 = spark.createDataFrame(
        [(1, "a", 10.5), (2, "a", 2.75), (3, "b", 30.0), (5, "d", -0.1)],
        "id long, name string, amount double",
    )
    write_version(v2, root)

    state = _recompute(read_version(spark, root, 1))
    feed = version_diff(spark, root, ["id"], v_from=1, v_to=2)
    maintained = maintain_aggregate(state, feed, ["name"], "amount")

    assert table_checksum(maintained) == table_checksum(
        _recompute(read_version(spark, root, 2))
    )
    # group c is gone entirely, not present with a zero count
    assert maintained.filter(F.col("name") == "c").count() == 0


def test_maintain_with_empty_feed_is_identity(spark, tmp_path):
    from data_lake_spark.versioned import (
        maintain_aggregate,
        read_version,
        version_diff,
        write_version,
    )

    root = str(tmp_path / "mv2")
    v = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 6.0)], "id long, name string, amount double"
    )
    write_version(v, root)
    write_version(v, root)
    state = _recompute(read_version(spark, root, 1))
    feed = version_diff(spark, root, ["id"], v_from=1, v_to=2)
    maintained = maintain_aggregate(state, feed, ["name"], "amount")
    assert table_checksum(maintained) == table_checksum(state)


def test_duplicate_key_snapshot_raises(spark, tmp_path):
    # duplicate-keyed rows would fan out M×N in the full-outer join and
    # make apply_changes unable to reproduce the target — the in-plan
    # raise_error guard must surface the malformed snapshot loudly
    root = str(tmp_path / "dup")
    good = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    dup = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], "id long, name string"
    )
    write_version(good, root)
    write_version(dup, root)
    with pytest.raises(Exception, match="duplicate key in post snapshot"):
        version_diff(spark, root, ["id"], v_from=1, v_to=2).collect()
    with pytest.raises(Exception, match="duplicate key in pre snapshot"):
        version_diff(spark, root, ["id"], v_from=2, v_to=1).collect()
