"""SCD2 dimension versioning + stream-stream join / streaming dedup.

Streaming tests follow the one-parquet-file-per-micro-batch discipline
(coalesce(1) per write): multi-file batches arrive in arbitrary order and
would break order-dependent assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.operators.scd import OPEN_END, asof_dim_lookup, scd2_apply
from data_lake_spark.streaming.incremental import stream_dedup, stream_interval_join


def _dim(spark, rows):
    return spark.createDataFrame(rows, "uid long, office string, valid_from string")


def _upd(spark, rows):
    return spark.createDataFrame(rows, "uid long, office string, eff_date string")


def test_scd2_initial_build(spark):
    cur = _dim(spark, [])
    upd = _upd(spark, [(1, "A", "2024-01-01"), (2, "B", "2024-02-01")])
    out = scd2_apply(cur, upd, key="uid", attrs=["office"]).collect()
    assert len(out) == 2
    assert all(r.valid_to == OPEN_END and r.is_current == 1 for r in out)


def test_scd2_change_noop_and_order(spark):
    cur = _dim(spark, [(1, "A", "2024-01-01")])
    upd = _upd(
        spark,
        [
            (1, "A", "2024-03-01"),  # no-op: same attrs as latest version
            (1, "B", "2024-06-01"),  # real change
            (1, "C", "2024-04-01"),  # out-of-order change applies by eff date
        ],
    )
    out = {
        (r.office): (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(cur, upd, key="uid", attrs=["office"]).collect()
    }
    assert out["A"] == ("2024-01-01", "2024-04-01", 0)
    assert out["C"] == ("2024-04-01", "2024-06-01", 0)
    assert out["B"] == ("2024-06-01", OPEN_END, 1)


def test_scd2_idempotent(spark):
    cur = _dim(spark, [(1, "A", "2024-01-01")])
    upd = _upd(spark, [(1, "B", "2024-06-01")])
    once = scd2_apply(cur, upd, key="uid", attrs=["office"])
    twice = scd2_apply(
        once.select("uid", "office", "valid_from"), upd, key="uid", attrs=["office"]
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_asof_dim_lookup(spark):
    cur = _dim(spark, [(1, "A", "2024-01-01")])
    upd = _upd(spark, [(1, "B", "2024-06-01")])
    dim = scd2_apply(cur, upd, key="uid", attrs=["office"])
    facts = spark.createDataFrame(
        [(1, "2024-03-15"), (1, "2024-07-01")], "uid long, date string"
    )
    got = {
        r.date: r.office
        for r in asof_dim_lookup(facts, dim, key="uid", date_col="date").collect()
    }
    assert got == {"2024-03-15": "A", "2024-07-01": "B"}


def test_streaming_scd2_maintenance(spark, tmp_path):
    import glob as _glob
    import os as _os
    import time as _time

    from data_lake_spark import versioned
    from data_lake_spark.streaming.incremental import start_scd2_maintenance

    schema = "uid long, office string, eff_date string"
    b1 = spark.createDataFrame(
        [(1, "A", "2024-01-01"), (2, "B", "2024-02-01")], schema
    )
    b2 = spark.createDataFrame(
        [(1, "B", "2024-06-01"), (2, "B", "2024-03-01")], schema  # 2nd is no-op
    )
    src = str(tmp_path / "upd")
    now = _time.time()
    for i, b in enumerate([b1, b2]):
        before = set(_glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(_glob.glob(src + "/*.parquet")) - before:
            _os.utime(f, (now - 60 + 30 * i,) * 2)

    dim_root = str(tmp_path / "dim")
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_scd2_maintenance(
        stream, dim_root, key="uid", attrs=["office"], eff_col="eff_date",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = {
        (r.uid, r.office): (r.valid_from, r.valid_to, r.is_current)
        for r in versioned.read_version(spark, dim_root).collect()
    }
    assert final == {
        (1, "A"): ("2024-01-01", "2024-06-01", 0),
        (1, "B"): ("2024-06-01", OPEN_END, 1),
        (2, "B"): ("2024-02-01", OPEN_END, 1),
    }
    # time travel: version 1 is the pre-change dimension
    v1 = {
        (r.uid, r.office): r.is_current
        for r in versioned.read_version(spark, dim_root, 1).collect()
    }
    assert v1 == {(1, "A"): 1, (2, "B"): 1}
    # matches the batch-face fold of ALL updates at once
    batch_face = scd2_apply(
        b1.select("uid", "office", F.col("eff_date").alias("valid_from")).limit(0),
        b1.unionByName(b2),
        key="uid",
        attrs=["office"],
    )
    bf = {
        (r.uid, r.office): (r.valid_from, r.valid_to, r.is_current)
        for r in batch_face.collect()
    }
    assert bf == final


def _ts_df(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.timestamp_seconds(F.col("ts")))


def test_stream_interval_join_matches_batch(spark, tmp_path):
    base = 1_700_000_000
    clicks = [(i, 7, base + i * 600) for i in range(10)]
    views = [(100 + i, 7, base + i * 600 - 120) for i in range(0, 10, 2)]
    cdf = _ts_df(spark, clicks, "event_id long, user_id long, ts long")
    vdf = _ts_df(spark, views, "event_id long, user_id long, ts long")

    expected = sorted(
        (r.event_id, r.r_event_id)
        for r in stream_interval_join(cdf, vdf, within_seconds=1800).collect()
    )
    assert expected  # batch face yields matches

    csrc, vsrc = str(tmp_path / "c"), str(tmp_path / "v")
    # two micro-batch files per side
    cdf.filter(F.col("event_id") < 5).coalesce(1).write.parquet(csrc)
    cdf.filter(F.col("event_id") >= 5).coalesce(1).write.mode("append").parquet(csrc)
    vdf.coalesce(1).write.parquet(vsrc)
    cs = spark.readStream.schema(cdf.schema).option("maxFilesPerTrigger", 1).parquet(csrc)
    vs = spark.readStream.schema(vdf.schema).parquet(vsrc)
    q = (
        stream_interval_join(cs, vs, within_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.event_id, r.r_event_id)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        )
    finally:
        q.stop()
    assert got == expected


def test_stream_dedup_across_batches(spark, tmp_path):
    base = 1_700_000_000
    b1 = _ts_df(
        spark, [(1, base), (2, base + 10)], "event_id long, ts long"
    )
    b2 = _ts_df(
        spark, [(2, base + 10), (3, base + 20)], "event_id long, ts long"
    )
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_dedup(stream, keys=["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        ids = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect())
    finally:
        q.stop()
    assert ids == [1, 2, 3]
    # batch face: plain dropDuplicates
    assert stream_dedup(b1.unionAll(b2), keys=["event_id"]).count() == 3
