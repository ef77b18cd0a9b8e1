"""Streaming drift monitor: per-batch output is bit-identical to the
batch drift_report on the same rows, and replay republishes identical
batches (the stream==batch + idempotence conventions)."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.drift import drift_report
from data_lake_spark.streaming.incremental import (
    read_ingest_zone,
    start_drift_monitor,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
_BIN_CENTS = 5_000_000


def _binned_orders(spark):
    return load_table(spark, SF, "orders").select(
        "o_orderkey",
        F.expr(
            f"CAST(FLOOR(o_totalprice * 100) AS BIGINT) div {_BIN_CENTS}"
        ).alias("bin"),
    )


def _staged_source(spark, tmp_path, rows):
    b1 = rows.filter(F.col("o_orderkey") % 2 == 0)
    b2 = rows.filter(F.col("o_orderkey") % 2 == 1)
    src = str(tmp_path / "src")
    now = time.time()
    for i, b in enumerate([b1, b2]):
        before = set(glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f, (now - 60 + 30 * i,) * 2)
    return src


def _run(spark, tmp_path, rows, src, ref):
    out = str(tmp_path / "drift")
    stream = spark.readStream.schema(rows.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_drift_monitor(
        stream, ref, out, str(tmp_path / "ckpt"), bin_col="bin"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return out


def _rows_set(df):
    return sorted(
        tuple(r) for r in df.select(
            "bin", "a_cnt", "b_cnt", "a_micro", "b_micro",
            "l1_micro", "chi2_micro",
        ).collect()
    )


def test_stream_batches_match_batch_drift_report(spark, tmp_path):
    rows = _binned_orders(spark)
    ref = rows.groupBy("bin").agg(F.count(F.lit(1)).alias("a_cnt"))
    src = _staged_source(spark, tmp_path, rows)
    out = _run(spark, tmp_path, rows, src, ref)

    stored = read_ingest_zone(spark, out)
    assert sorted(
        r.batch_id for r in stored.select("batch_id").distinct().collect()
    ) == [0, 1]
    for parity, batch_id in ((0, 0), (1, 1)):
        batch_rows = rows.filter(F.col("o_orderkey") % 2 == parity)
        b = batch_rows.groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias("b_cnt")
        )
        expect = drift_report(
            ref.join(b, "bin", "full_outer").select(
                "bin",
                F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
                F.coalesce("b_cnt", F.lit(0)).alias("b_cnt"),
            )
        )
        got = stored.filter(F.col("batch_id") == batch_id).drop("batch_id")
        assert _rows_set(got) == _rows_set(expect)
        # the half-stream batch drifts little vs the full reference:
        # its TOTAL L1 stays far from the 2e6 disjoint-mass maximum
        total = [r for r in got.collect() if r.bin == -1][0]
        assert total.l1_micro < 500_000


def test_drift_monitor_replay_is_idempotent(spark, tmp_path):
    import shutil

    rows = _binned_orders(spark)
    ref = rows.groupBy("bin").agg(F.count(F.lit(1)).alias("a_cnt"))
    src = _staged_source(spark, tmp_path, rows)
    out = _run(spark, tmp_path, rows, src, ref)
    before = _rows_set(read_ingest_zone(spark, out).drop("batch_id"))

    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    stream = spark.readStream.schema(rows.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_drift_monitor(
        stream, ref, out, str(tmp_path / "ckpt"), bin_col="bin"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _rows_set(read_ingest_zone(spark, out).drop("batch_id")) == before


def test_new_category_mass_is_counted(spark):
    # a batch concentrated in a bin the reference has never seen must
    # surface at full weight (the full-outer fill-0 contract), not drop
    ref = spark.createDataFrame([(0, 90), (1, 10)], "bin long, a_cnt long")
    binned = ref.join(
        spark.createDataFrame([(2, 100)], "bin long, b_cnt long"),
        "bin",
        "full_outer",
    ).select(
        "bin",
        F.coalesce("a_cnt", F.lit(0)).alias("a_cnt"),
        F.coalesce("b_cnt", F.lit(0)).alias("b_cnt"),
    )
    total = [r for r in drift_report(binned).collect() if r.bin == -1][0]
    assert total.l1_micro == 2_000_000  # fully disjoint distributions
