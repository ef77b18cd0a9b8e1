"""Streaming data-quality gate: exactly-once routing to clean vs
quarantine, Deequ null semantics (NULL verdict fails), reason strings,
and crash-replay idempotence."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.streaming.incremental import (
    read_ingest_zone,
    start_validated_ingest,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _checks():
    return [
        ("value_nonneg", F.col("value") >= 0),
        ("type_known", F.col("event_type").isin("view", "click", "purchase")),
        ("user_present", F.col("user_id").isNotNull()),
    ]


def _dirty_events(spark):
    """events with three injected violation rows (one per check) plus a
    NULL-value row that must fail value_nonneg via the NULL-fails rule."""
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", F.col("value")
    )
    bad = spark.createDataFrame(
        [
            (10_000_001, 1, 7, "view", -5.0),  # negative value
            (10_000_002, 2, 7, "hacked", 1.0),  # unknown type
            (10_000_003, 3, None, "click", 1.0),  # missing user
            (10_000_004, 4, 7, "view", None),  # NULL value -> fails range
        ],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    return ev.unionByName(bad)


def _staged_source(spark, tmp_path, ev):
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    now = time.time()
    for i, b in enumerate([b1, b2]):
        before = set(glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f, (now - 60 + 30 * i,) * 2)
    return src


def _run_gate(spark, tmp_path, ev):
    src = _staged_source(spark, tmp_path, ev)
    clean, quar = str(tmp_path / "clean"), str(tmp_path / "quar")
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_validated_ingest(
        stream, clean, quar, checkpoint=str(tmp_path / "ckpt"), checks=_checks()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return clean, quar


def test_every_row_routed_exactly_once(spark, tmp_path):
    ev = _dirty_events(spark)
    clean, quar = _run_gate(spark, tmp_path, ev)
    n_clean = read_ingest_zone(spark, clean).count()
    n_quar = read_ingest_zone(spark, quar).count()
    assert n_clean + n_quar == ev.count()
    # ids must partition exactly (no row in both zones)
    ids_c = {r.event_id for r in read_ingest_zone(spark, clean).select("event_id").collect()}
    ids_q = {r.event_id for r in read_ingest_zone(spark, quar).select("event_id").collect()}
    assert not (ids_c & ids_q)


def test_clean_zone_is_constraint_true_and_reasons_name_failures(spark, tmp_path):
    ev = _dirty_events(spark)
    clean, quar = _run_gate(spark, tmp_path, ev)
    cdf = read_ingest_zone(spark, clean)
    for name, pred in _checks():
        assert cdf.filter(~F.coalesce(pred, F.lit(False))).count() == 0, name
    reasons = {
        r.event_id: r.dq_reasons
        for r in read_ingest_zone(spark, quar)
        .select("event_id", "dq_reasons")
        .collect()
        if r.event_id >= 10_000_000
    }
    assert reasons[10_000_001] == "value_nonneg"
    assert reasons[10_000_002] == "type_known"
    assert reasons[10_000_003] == "user_present"
    # NULL verdict fails the range check (the Deequ convention)
    assert reasons[10_000_004] == "value_nonneg"


def test_multi_failure_row_reports_all_reasons(spark, tmp_path):
    bad = spark.createDataFrame(
        [(1, 1, None, "hacked", -1.0)],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    clean, quar = _run_gate(spark, tmp_path, bad)
    rows = read_ingest_zone(spark, quar).collect()
    assert len(rows) == 1
    assert rows[0].dq_reasons == "value_nonneg,type_known,user_present"
    assert read_ingest_zone(spark, clean).count() == 0


def test_replayed_batch_is_idempotent(spark, tmp_path):
    ev = _dirty_events(spark)
    clean, quar = _run_gate(spark, tmp_path, ev)
    before = (
        sorted(map(tuple, read_ingest_zone(spark, clean).collect())),
        sorted(map(tuple, read_ingest_zone(spark, quar).collect())),
    )
    # simulate a crash-replay of batch 0: re-route the same batch frame
    # against the same batch_id — the overwrite dirs must republish
    # identical rows, not append duplicates
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    reasons = F.concat_ws(
        ",",
        *[
            F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
            for name, pred in _checks()
        ],
    )
    routed = b0.withColumn("__dq_reasons", reasons)
    routed.filter(F.col("__dq_reasons") == "").drop("__dq_reasons").write.mode(
        "overwrite"
    ).parquet(f"{clean}/batch_id=0")
    routed.filter(F.col("__dq_reasons") != "").withColumnRenamed(
        "__dq_reasons", "dq_reasons"
    ).write.mode("overwrite").parquet(f"{quar}/batch_id=0")
    after = (
        sorted(map(tuple, read_ingest_zone(spark, clean).collect())),
        sorted(map(tuple, read_ingest_zone(spark, quar).collect())),
    )
    assert after == before


def test_empty_zone_reads_as_empty_frame(spark, tmp_path):
    assert read_ingest_zone(spark, str(tmp_path / "nope")).count() == 0
    # with a schema, data-column access on a missing zone resolves too
    # (the triage pattern: select reasons from a possibly-empty side)
    df = read_ingest_zone(
        spark,
        str(tmp_path / "nope2"),
        schema="event_id long, dq_reasons string",
    )
    assert df.select("event_id", "dq_reasons").count() == 0
