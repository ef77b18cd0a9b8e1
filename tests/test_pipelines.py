"""End-to-end medallion lifecycle (pipelines.py) + partition-scoped
backfill (Lake.overwrite_partitions) + left-outer stream-stream join."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from data_lake_spark.io import Lake
from data_lake_spark.pipelines import run_medallion
from data_lake_spark.streaming.incremental import stream_interval_join

FEED = {
    "studios": [
        {
            "studioId": 1,
            "emailAddress": "studio1@x.com",
            "earnings": [{"date": "2024-01-01", "payableAmount": 10.5}],
            "performers": [
                {
                    "performerId": 11,
                    "nickname": "alpha",
                    "emailAddress": "alpha@x.com",
                    "earnings": [
                        {"date": "2024-01-01", "onlineSeconds": 3600, "payableAmount": 5.0},
                        {"date": "2024-01-02", "onlineSeconds": 1800, "payableAmount": 2.5},
                    ],
                },
                {
                    "performerId": 12,
                    "nickname": "beta",
                    "emailAddress": "beta@x.com",
                    "earnings": [
                        {"date": "2024-01-01", "onlineSeconds": 600, "payableAmount": 1.0}
                    ],
                },
            ],
        }
    ],
    "data_timestamp": 1700000000,
}


def test_medallion_end_to_end(spark, tmp_path):
    users = spark.createDataFrame(
        [("u1", "alpha@x.com"), ("u2", "beta@x.com")], "_id string, streamateUser string"
    )
    out = run_medallion(spark, str(tmp_path / "lake"), FEED, users)
    assert out["bronze"].count() == 1
    silver = {(r.performerId, r.date): r._id for r in out["silver"].collect()}
    assert silver[(11, "2024-01-01")] == "u1" and silver[(12, "2024-01-01")] == "u2"
    gold = {r.date: r.total_earnings for r in out["gold"].collect()}
    assert gold == {"2024-01-01": 6.0, "2024-01-02": 2.5}
    # idempotent replay: same payload, same gold
    out2 = run_medallion(spark, str(tmp_path / "lake"), FEED, users)
    assert out2["bronze"].count() == 1
    assert {r.date: r.total_earnings for r in out2["gold"].collect()} == gold


def test_overwrite_partitions_backfill(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    full = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-02", 2, 20.0), ("2024-01-03", 3, 30.0)],
        "d string, id long, v double",
    )
    lake.write(full, "silver", "t", partition_by=["d"])
    # backfill ONE day with corrected values
    fix = spark.createDataFrame([("2024-01-02", 2, 99.0)], "d string, id long, v double")
    lake.overwrite_partitions(fix, "silver", "t", partition_by=["d"])
    # partition values come back type-inferred (DATE here) — stringify
    got = {str(r.d): r.v for r in lake.read("silver", "t").collect()}
    assert got == {"2024-01-01": 10.0, "2024-01-02": 99.0, "2024-01-03": 30.0}


def _ts_df(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.timestamp_seconds(F.col("ts")))


def test_stream_interval_join_left_outer(spark, tmp_path):
    base = 1_700_000_000
    # clicks 0-2 have matching views in [ts-300, ts]; click 3 has none
    # (outer null); late batches advance the watermark so outer state
    # finalizes
    clicks1 = _ts_df(
        spark,
        [(0, 7, base + 100), (1, 7, base + 200), (2, 7, base + 300), (3, 7, base + 3000)],
        "event_id long, user_id long, ts long",
    )
    views = _ts_df(
        spark,
        [(100, 7, base + 50), (101, 7, base + 150)],
        "event_id long, user_id long, ts long",
    )
    schema = "event_id long, user_id long, ts long"
    # the GLOBAL watermark is the MIN across all streams — BOTH sides
    # must see advancing event time or outer state never finalizes
    cadv1 = _ts_df(spark, [(8, 9, base + 90000)], schema)
    cadv2 = _ts_df(spark, [(9, 9, base + 95000)], schema)
    vadv1 = _ts_df(spark, [(908, 9, base + 90000)], schema)
    vadv2 = _ts_df(spark, [(909, 9, base + 95000)], schema)

    csrc, vsrc = str(tmp_path / "c"), str(tmp_path / "v")
    now = time.time()
    for src, batches in ((csrc, [clicks1, cadv1, cadv2]), (vsrc, [views, vadv1, vadv2])):
        for i, b in enumerate(batches):
            before = set(glob.glob(src + "/*.parquet"))
            b.coalesce(1).write.mode("append").parquet(src)
            for f in set(glob.glob(src + "/*.parquet")) - before:
                os.utime(f, (now - 100 + 30 * i,) * 2)

    cs = (
        spark.readStream.schema(clicks1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(csrc)
    )
    vs = (
        spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vsrc)
    )
    q = (
        stream_interval_join(
            cs, vs, within_seconds=300, watermark="10 minutes", how="left_outer"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_id, r.r_event_id)
            for r in spark.sql("SELECT * FROM ssj_outer").collect()
            if r.user_id == 7
        }
    finally:
        q.stop()
    # matched pairs emit eagerly; the unmatched click emits with null
    # once the watermark proves no view can still arrive
    expected = {(0, 100), (1, 100), (1, 101), (2, 100), (2, 101), (3, None)}
    assert got == expected
    # batch face agrees
    batch = {
        (r.event_id, r.r_event_id)
        for r in stream_interval_join(
            clicks1, views, within_seconds=300, how="left_outer"
        ).collect()
    }
    assert batch == expected


def test_silver_gate_rejects_bad_payload(spark, tmp_path):
    import copy

    import pytest

    from data_lake_spark.quality import QualityGateError

    bad = copy.deepcopy(FEED)
    # negative payable amount must abort the silver publish entirely
    bad["studios"][0]["performers"][0]["earnings"][0]["payableAmount"] = -4.0
    users = spark.createDataFrame(
        [("u1", "alpha@x.com")], "_id string, streamateUser string"
    )
    with pytest.raises(QualityGateError):
        run_medallion(spark, str(tmp_path / "lake"), bad, users)
    # nothing was published to silver
    import os

    assert not os.path.exists(str(tmp_path / "lake" / "silver"))
