"""Incremental gold rollup (pipelines.incremental_event_rollup):
incremental result == from-scratch recompute, refreshes are no-ops
without new data, and the watermark commits atomically with the rollup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.pipelines import incremental_event_rollup
from data_lake_spark.versioned import current_snapshot_id, read_table


def _split_events(spark, sf_dir, tmp_path):
    """Write two sf-dir prefixes: first half of events by ts, then all."""
    ev = load_table(spark, sf_dir, "events")
    mid = ev.approxQuantile("ts", [0.5], 0.0)[0]
    d1, d2 = str(tmp_path / "sf_half"), str(tmp_path / "sf_full")
    for d in (d1, d2):
        os.makedirs(d, exist_ok=True)
    # raw parquet re-write keeps the long-nanos contract (already long)
    ev.filter(F.col("ts") <= mid).write.mode("overwrite").parquet(
        os.path.join(d1, "events.parquet")
    )
    ev.write.mode("overwrite").parquet(os.path.join(d2, "events.parquet"))
    return d1, d2


def test_incremental_equals_scratch(spark, sf_dir, tmp_path):
    d1, d2 = _split_events(spark, sf_dir, tmp_path)
    inc_root = str(tmp_path / "gold_inc")
    s1 = incremental_event_rollup(spark, inc_root, d1)
    s2 = incremental_event_rollup(spark, inc_root, d2)
    assert (s1, s2) == (1, 2)

    scratch_root = str(tmp_path / "gold_scratch")
    incremental_event_rollup(spark, scratch_root, d2)

    inc = {
        r.day: (r.value_u, r.n_events)
        for r in read_table(spark, inc_root, "rollup").collect()
    }
    scratch = {
        r.day: (r.value_u, r.n_events)
        for r in read_table(spark, scratch_root, "rollup").collect()
    }
    assert inc == scratch  # bit-identical totals


def test_refresh_without_new_data_is_noop(spark, sf_dir, tmp_path):
    d1, _ = _split_events(spark, sf_dir, tmp_path)
    root = str(tmp_path / "gold")
    s1 = incremental_event_rollup(spark, root, d1)
    s2 = incremental_event_rollup(spark, root, d1)
    assert s1 == s2 == current_snapshot_id(root)


def test_watermark_advances_with_rollup(spark, sf_dir, tmp_path):
    d1, d2 = _split_events(spark, sf_dir, tmp_path)
    root = str(tmp_path / "gold")
    incremental_event_rollup(spark, root, d1)
    wm1 = read_table(spark, root, "watermark").collect()[0].ts_ns
    incremental_event_rollup(spark, root, d2)
    wm2 = read_table(spark, root, "watermark").collect()[0].ts_ns
    assert wm2 > wm1
    # cross-table time travel: snapshot 1 pairs rollup 1 with watermark 1
    assert (
        read_table(spark, root, "watermark", snapshot_id=1)
        .collect()[0]
        .ts_ns
        == wm1
    )
