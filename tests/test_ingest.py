"""M2 ingest/ETL operators: JSON payload source, nested flatten, medallion
zones, upsert with decrease-traceability, dedup family, incremental scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_spark.io import Lake, read_json_payload, read_records
from data_lake_spark.operators.nested import (
    STREAMATE_FEED_SCHEMA,
    conform_earnings_by_performer,
    flatten_performer_earnings,
    flatten_studio_earnings,
)
from data_lake_spark.operators.upsert import (
    dedup_content,
    high_watermark_filter,
    keep_latest,
    upsert_performance,
)

FEED = {
    "studios": [
        {
            "studioId": 1,
            "emailAddress": "studio1@x.com",
            "earnings": [
                {"date": "2024-01-01", "payableAmount": 10.5},
                {"date": "2024-01-02", "payableAmount": 20.0},
            ],
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
        },
        {
            "studioId": 2,
            "emailAddress": "studio2@x.com",
            "earnings": [{"date": "2024-01-01", "payableAmount": 7.0}],
            "performers": [],
        },
    ],
    "data_timestamp": 1704067200,
}


@pytest.fixture(scope="module")
def feed_df(spark):
    return read_json_payload(spark, FEED, STREAMATE_FEED_SCHEMA)


def test_flatten_studio_earnings(feed_df):
    rows = {
        (r.studioId, r.date): r.payableAmount
        for r in flatten_studio_earnings(feed_df).collect()
    }
    assert rows == {(1, "2024-01-01"): 10.5, (1, "2024-01-02"): 20.0, (2, "2024-01-01"): 7.0}


def test_flatten_performer_earnings(feed_df):
    out = flatten_performer_earnings(feed_df).collect()
    assert len(out) == 3  # empty performers array contributes nothing
    assert {r.nickname for r in out} == {"alpha", "beta"}
    assert sum(r.onlineSeconds for r in out) == 6000


def test_conform_with_users(spark, feed_df):
    users = read_records(
        spark,
        [
            {"_id": "u1", "streamateUser": "alpha@x.com"},
            {"_id": "u2", "streamateUser": "nobody@x.com"},
        ],
        "struct<_id:string,streamateUser:string>",
    )
    out = conform_earnings_by_performer(feed_df, users).collect()
    by_nick = {(r.nickname, r.date): r._id for r in out}
    assert by_nick[("alpha", "2024-01-01")] == "u1"
    assert by_nick[("beta", "2024-01-01")] is None  # left-outer keeps unmatched


def test_lake_zones_roundtrip(spark, tmp_path):
    lake = Lake(spark, str(tmp_path))
    df = spark.range(10).withColumn("part", (F.col("id") % 2).cast("string"))
    out = lake.write(df, "bronze", "numbers", partition_by=["part"])
    assert lake.exists("bronze", "numbers")
    back = lake.register("bronze", "numbers")
    assert back.count() == 10
    assert spark.sql("SELECT count(*) c FROM bronze_numbers").first().c == 10
    # partition pruning: reading one partition touches only that dir
    one = spark.read.parquet(out).filter(F.col("part") == "1")
    assert one.count() == 5
    with pytest.raises(ValueError):
        lake.path("platinum", "x")


PERF_COLS = "struct<_id:string,date:string,total_earnings:string,online_seconds:string,file:string,updated_at:string>"


def test_upsert_insert_update_trace(spark):
    existing = read_records(
        spark,
        [
            {"_id": "a", "date": "2024-01-01", "total_earnings": "100.0",
             "online_seconds": "3600", "file": "f1", "updated_at": "2024-01-01T00:00:00"},
            {"_id": "b", "date": "2024-01-01", "total_earnings": "50.0",
             "online_seconds": "1000", "file": "f2", "updated_at": "2024-01-01T00:00:00"},
        ],
        PERF_COLS,
    )
    incoming = read_records(
        spark,
        [
            # update, increase (no trace)
            {"_id": "a", "date": "2024-01-01", "total_earnings": "120.0",
             "online_seconds": "4000", "file": "f1", "updated_at": "2024-01-02T00:00:00"},
            # update, DECREASE (trace)
            {"_id": "b", "date": "2024-01-01", "total_earnings": "40.0",
             "online_seconds": "900", "file": "f2", "updated_at": "2024-01-02T00:00:00"},
            # brand new (insert)
            {"_id": "c", "date": "2024-01-02", "total_earnings": "10.0",
             "online_seconds": "60", "file": "f3", "updated_at": "2024-01-02T00:00:00"},
            # duplicate redelivery of the same key — older updated_at loses
            {"_id": "c", "date": "2024-01-02", "total_earnings": "9.0",
             "online_seconds": "59", "file": "f3", "updated_at": "2024-01-01T23:00:00"},
        ],
        PERF_COLS,
    )
    res = upsert_performance(existing, incoming)
    merged = {(r._id, r.date): r for r in res.merged.collect()}
    assert len(merged) == 3
    assert merged[("a", "2024-01-01")].total_earnings == "120.0"
    assert merged[("b", "2024-01-01")].total_earnings == "40.0"
    assert merged[("c", "2024-01-02")].total_earnings == "10.0"  # latest wins
    trace = res.trace.collect()
    assert len(trace) == 1
    t = trace[0]
    assert (t._id, t.prev_total_earnings, t.new_total_earnings) == ("b", "50.0", "40.0")
    counts = res.n_updated_expr.first()
    assert (counts.n_incoming, counts.n_updated, counts.n_inserted) == (3, 2, 1)


def test_upsert_delta_merge_backend(spark, tmp_path):
    """The same upsert semantics through a real Delta MERGE INTO when
    delta-spark is present. This sandbox ships without delta-spark, so
    the test documents the skip rather than pretending the emulation IS
    Delta; on a delta-enabled cluster it runs the true MERGE path."""
    import pytest as _pytest

    from data_lake_spark.operators.upsert import (
        delta_available,
        upsert_performance_delta,
    )

    if not delta_available(spark):
        _pytest.skip(
            "delta-spark unavailable in this environment (verified: no "
            "'delta' module on the Python path, no delta-* jar in the "
            "pyspark jars dir, and the sandbox has no package network "
            "access to fetch io.delta:delta-spark matching pyspark "
            f"{__import__('pyspark').__version__}); MERGE INTO path "
            "exercised only on delta-enabled clusters "
            "(upsert_performance is the plain-Parquet emulation)"
        )
    path = str(tmp_path / "delta_perf")
    existing = read_records(
        spark,
        [
            {"_id": "a", "date": "2024-01-01", "total_earnings": "100.0",
             "online_seconds": "3600", "file": "f1", "updated_at": "2024-01-01T00:00:00"},
        ],
        PERF_COLS,
    )
    existing.write.format("delta").save(path)
    incoming = read_records(
        spark,
        [
            {"_id": "a", "date": "2024-01-01", "total_earnings": "40.0",
             "online_seconds": "900", "file": "f1", "updated_at": "2024-01-02T00:00:00"},
            {"_id": "c", "date": "2024-01-02", "total_earnings": "10.0",
             "online_seconds": "60", "file": "f3", "updated_at": "2024-01-02T00:00:00"},
        ],
        PERF_COLS,
    )
    trace = upsert_performance_delta(spark, path, incoming)
    merged = {
        (r._id, r.date): r
        for r in spark.read.format("delta").load(path).collect()
    }
    assert len(merged) == 2
    assert merged[("a", "2024-01-01")].total_earnings == "40.0"
    assert [t._id for t in trace.collect()] == ["a"]


def test_upsert_idempotent(spark):
    existing = read_records(
        spark,
        [{"_id": "a", "date": "d", "total_earnings": "1.0", "online_seconds": "1",
          "file": "f", "updated_at": "t1"}],
        PERF_COLS,
    )
    res = upsert_performance(existing, existing)
    assert res.merged.count() == 1
    assert res.trace.count() == 0


def test_keep_latest_and_dedup_content(spark):
    df = read_records(
        spark,
        [
            {"k": "x", "v": 1, "ts": 1, "year": 2024},
            {"k": "x", "v": 2, "ts": 2, "year": 2025},
            {"k": "y", "v": 3, "ts": 1, "year": 2024},
        ],
        "struct<k:string,v:int,ts:int,year:int>",
    )
    latest = {r.k: r.v for r in keep_latest(df, ["k"], "ts").collect()}
    assert latest == {"x": 2, "y": 3}
    # same content row differing only in audit col year → one survivor
    dup = read_records(
        spark,
        [{"k": "x", "v": 1, "year": 2024}, {"k": "x", "v": 1, "year": 2025}],
        "struct<k:string,v:int,year:int>",
    )
    assert dedup_content(dup, ["year"]).count() == 1


def test_high_watermark(spark):
    df = spark.range(100).withColumn("ts", F.col("id"))
    assert high_watermark_filter(df, "ts", 89).count() == 10
    assert high_watermark_filter(df, "ts", None).count() == 100


def test_compact_small_files(spark, tmp_path):
    from data_lake_spark.io import compact

    path = str(tmp_path / "sprawl")
    # simulate per-record ingest: 40 tiny files
    spark.range(0, 400).withColumn("v", F.col("id") * 2).repartition(40).write.parquet(path)
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 30
    rows_before = sorted(r.id for r in spark.read.parquet(path).collect())
    n = compact(spark, path)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after == n == 1  # tiny table -> one right-sized file
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows_before


def test_schema_evolution_read(spark, tmp_path):
    from data_lake_spark.io import read_merged_schema

    path = str(tmp_path / "drift")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)
    merged = read_merged_schema(spark, path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}  # old rows surface the new col as null


def test_mongo_reader_contract(spark):
    """S9 honesty contract: without the Mongo connector jar the reader
    must refuse loudly (pointing at the parquet model), never pretend to
    read; with the connector present it must return a DataFrame."""
    from data_lake_spark.io import mongo_connector_available, read_mongo_dim

    if mongo_connector_available(spark):
        df = read_mongo_dim(
            spark, "mongodb://localhost:27017", "db_users", "users"
        )
        assert df.columns is not None
    else:
        with pytest.raises(RuntimeError, match="parquet inputs"):
            read_mongo_dim(
                spark, "mongodb://localhost:27017", "db_users", "users"
            )


def test_fetch_json_payload_with_injected_transport(spark):
    # the live-HTTP form of S1: transport is injectable so the ingest
    # job is testable without network; production swaps in its client
    from data_lake_spark.io import fetch_json_payload

    calls = {}

    def stub(url, body, headers, timeout):
        calls.update(url=url, body=body, headers=headers, timeout=timeout)
        import json as _json

        return _json.dumps(FEED)

    df = fetch_json_payload(
        spark,
        "https://api.example.test/earnings",
        body={"period": "2024-01"},
        headers={"X-Auth": "token"},
        schema=STREAMATE_FEED_SCHEMA,
        transport=stub,
    )
    assert calls["url"] == "https://api.example.test/earnings"
    assert calls["body"] == {"period": "2024-01"}
    assert calls["headers"]["X-Auth"] == "token"
    got = {
        (r.studioId, r.date): r.payableAmount
        for r in flatten_studio_earnings(df).collect()
    }
    assert got == {
        (1, "2024-01-01"): 10.5,
        (1, "2024-01-02"): 20.0,
        (2, "2024-01-01"): 7.0,
    }
