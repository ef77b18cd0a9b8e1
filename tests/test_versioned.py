"""Snapshot-versioned tables (versioned.py): commit/publish atomicity,
pinned reads, history, vacuum."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_spark.versioned import (
    current_version,
    list_versions,
    merge_into,
    read_version,
    vacuum,
    write_version,
)


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_write_read_roundtrip_and_history(spark, tmp_path):
    root = str(tmp_path / "t")
    assert current_version(root) == 0
    v1 = write_version(_df(spark, 3, "a"), root)
    v2 = write_version(_df(spark, 5, "a"), root)
    assert (v1, v2) == (1, 2)
    assert current_version(root) == 2
    assert read_version(spark, root).count() == 5  # latest
    assert read_version(spark, root, 1).count() == 3  # time travel
    # diff two versions: rows added between v1 and v2
    diff = read_version(spark, root, 2).exceptAll(read_version(spark, root, 1))
    assert sorted(r.id for r in diff.collect()) == [3, 4]


def test_pinned_read_survives_new_publish(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(_df(spark, 3, "a"), root)
    pinned = read_version(spark, root)  # resolves to v1 NOW
    write_version(_df(spark, 10, "b"), root)
    assert pinned.count() == 3  # still the v1 snapshot
    assert read_version(spark, root).count() == 10


def test_crashed_writer_invisible(spark, tmp_path):
    root = str(tmp_path / "t")
    write_version(_df(spark, 3, "a"), root)
    # simulate a crash: version dir exists but pointer never flipped
    _df(spark, 99, "crash").write.parquet(os.path.join(root, "_v=2"))
    assert current_version(root) == 1
    assert read_version(spark, root).count() == 3
    # next writer skips the orphaned directory rather than colliding
    v = write_version(_df(spark, 4, "c"), root)
    assert v == 3
    assert read_version(spark, root).count() == 4


def test_merge_into_upsert_with_history(spark, tmp_path):
    root = str(tmp_path / "t")
    day1 = spark.createDataFrame(
        [(1, "2024-01-01", 10.0, 1), (2, "2024-01-01", 20.0, 1)],
        "id long, d string, v double, seq long",
    )
    day2 = spark.createDataFrame(
        [(2, "2024-01-01", 25.0, 2), (3, "2024-01-02", 30.0, 2)],
        "id long, d string, v double, seq long",
    )
    v1 = merge_into(spark, root, day1, keys=["id", "d"], order_col="seq")
    v2 = merge_into(spark, root, day2, keys=["id", "d"], order_col="seq")
    assert (v1, v2) == (1, 2)
    now = {(r.id, r.d): r.v for r in read_version(spark, root).collect()}
    assert now == {(1, "2024-01-01"): 10.0, (2, "2024-01-01"): 25.0, (3, "2024-01-02"): 30.0}
    # pre-merge state still queryable: the audit trail MERGE destroys
    before = {(r.id, r.d): r.v for r in read_version(spark, root, 1).collect()}
    assert before == {(1, "2024-01-01"): 10.0, (2, "2024-01-01"): 20.0}
    # replaying the same merge is a no-op on content (idempotent)
    merge_into(spark, root, day2, keys=["id", "d"], order_col="seq")
    again = {(r.id, r.d): r.v for r in read_version(spark, root).collect()}
    assert again == now


def test_vacuum_keeps_recent(spark, tmp_path):
    root = str(tmp_path / "t")
    for i in range(4):
        write_version(_df(spark, i + 1, f"v{i}"), root)
    dropped = vacuum(root, keep_last=2)
    assert dropped == [1, 2]
    assert list_versions(root) == [3, 4]
    assert read_version(spark, root).count() == 4
    assert read_version(spark, root, 3).count() == 3


# --- multi-table atomic commits --------------------------------------------


def test_commit_tables_atomic_pair(spark, tmp_path):
    from data_lake_spark.versioned import (
        commit_tables,
        current_snapshot_id,
        read_table,
    )

    root = str(tmp_path / "group")
    a1 = spark.createDataFrame([(1, "x")], "id int, s string")
    b1 = spark.createDataFrame([(1, 10.0)], "id int, v double")
    sid1 = commit_tables({"a": a1, "b": b1}, root)
    assert sid1 == 1
    # second snapshot updates only table a; b carries forward
    a2 = spark.createDataFrame([(2, "y")], "id int, s string")
    sid2 = commit_tables({"a": a2}, root)
    assert current_snapshot_id(root) == sid2 == 2
    assert read_table(spark, root, "a").collect()[0].id == 2
    assert read_table(spark, root, "b").collect()[0].v == 10.0
    # time travel is cross-table consistent
    assert read_table(spark, root, "a", snapshot_id=1).collect()[0].id == 1


def test_staged_but_uncommitted_invisible(spark, tmp_path):
    import os

    from data_lake_spark.versioned import commit_tables, read_table

    root = str(tmp_path / "group")
    commit_tables(
        {"a": spark.createDataFrame([(1,)], "id int")}, root
    )
    # simulate a crashed writer: orphan version dir, no manifest flip
    orphan = os.path.join(root, "a", "_v=99")
    spark.createDataFrame([(99,)], "id int").write.parquet(orphan)
    assert read_table(spark, root, "a").collect()[0].id == 1
    # and the next commit skips past the orphan without clobbering it
    sid = commit_tables(
        {"a": spark.createDataFrame([(2,)], "id int")}, root
    )
    assert read_table(spark, root, "a", snapshot_id=sid).collect()[0].id == 2


def test_read_unknown_table_raises(spark, tmp_path):
    import pytest

    from data_lake_spark.versioned import commit_tables, read_table

    root = str(tmp_path / "group")
    commit_tables({"a": spark.createDataFrame([(1,)], "id int")}, root)
    with pytest.raises(FileNotFoundError):
        read_table(spark, root, "nope")
