"""Streaming k-anonymity release gate: per-batch routing invariants,
gate+sweep == one-shot batch audit equivalence, and replay idempotence
(the test_sketch_stream conventions)."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from data_lake_spark.streaming.incremental import (
    promote_pending,
    read_ingest_zone,
    start_k_anonymity_gate,
)

QI = ["c_nationkey", "c_mktsegment"]
K = 5


def _rows(spark):
    """Three QI classes with known fates under the 2-batch even/odd
    custkey split: A (12 rows, 6/6 — releases at batch level), B (6
    rows, 3/3 — stranded in pending until the sweep), C (3 rows —
    below k forever)."""
    data = (
        [(i, 1, "AUTOMOBILE") for i in range(12)]  # class A
        + [(100 + i, 2, "BUILDING") for i in range(6)]  # class B
        + [(200 + i, 3, "MACHINERY") for i in range(3)]  # class C
    )
    return spark.createDataFrame(
        data, "c_custkey long, c_nationkey long, c_mktsegment string"
    )


def _staged_source(spark, tmp_path, rows):
    b1 = rows.filter(F.col("c_custkey") % 2 == 0)
    b2 = rows.filter(F.col("c_custkey") % 2 == 1)
    src = str(tmp_path / "src")
    now = time.time()
    for i, b in enumerate([b1, b2]):
        before = set(glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f, (now - 60 + 30 * i,) * 2)
    return src


def _run_gate(spark, tmp_path, rows, src):
    rel = str(tmp_path / "rel")
    pend = str(tmp_path / "pend")
    stream = spark.readStream.schema(rows.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_k_anonymity_gate(
        stream, rel, pend, str(tmp_path / "ckpt"), QI, k=K
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return rel, pend


def test_gate_release_zone_is_k_anonymous_every_batch(spark, tmp_path):
    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)

    released = read_ingest_zone(spark, rel)
    # the invariant the gate exists for: no released class below k —
    # and exactly class A (6 rows in batch 1, 6 joining in batch 2)
    classes = released.groupBy(*QI).count().collect()
    assert [(r["c_nationkey"], r["count"]) for r in classes] == [(1, 12)]
    # nothing dropped: release ∪ pending == input, row for row
    pending = read_ingest_zone(spark, pend)
    got = sorted(
        released.select("c_custkey").union(pending.select("c_custkey"))
        .toPandas()["c_custkey"]
    )
    assert got == sorted(rows.toPandas()["c_custkey"])


def test_gate_plus_sweep_equals_batch_audit(spark, tmp_path):
    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)

    # a class split across micro-batches (3+3) is stranded in pending —
    # the sweep promotes exactly those, so afterwards the released set
    # is precisely what the ONE-SHOT batch audit releases: rows whose
    # total class size >= k
    promote_pending(spark, rel, pend, QI, k=K)
    released = set(
        read_ingest_zone(spark, rel).toPandas()["c_custkey"]
    )
    eligible = rows.join(
        rows.groupBy(*QI).count().filter(F.col("count") >= K).select(*QI),
        QI,
        "left_semi",
    )
    assert released == set(eligible.toPandas()["c_custkey"])
    # and pending holds the rest, still below k as classes
    pending = read_ingest_zone(spark, pend)
    pclasses = pending.groupBy(*QI).count().collect()
    assert all(r["count"] < K for r in pclasses)
    # sweep is idempotent: a second run promotes nothing
    assert promote_pending(spark, rel, pend, QI, k=K) == 0


def test_gate_replay_is_idempotent(spark, tmp_path):
    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)
    n_rel = read_ingest_zone(spark, rel).count()
    n_pend = read_ingest_zone(spark, pend).count()

    # wipe the checkpoint and replay the same source: per-batch
    # overwrite dirs republish identical content, no duplication
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    stream = spark.readStream.schema(rows.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_k_anonymity_gate(
        stream, rel, pend, str(tmp_path / "ckpt"), QI, k=K
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert read_ingest_zone(spark, rel).count() == n_rel
    assert read_ingest_zone(spark, pend).count() == n_pend


def test_promote_crash_replay_does_not_duplicate(spark, tmp_path):
    # simulate the crash window: the release write succeeded but the
    # pending rewrite didn't — re-running the sweep must OVERWRITE the
    # same deterministic promo dir, not append a duplicate batch
    import shutil

    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)

    snap = str(tmp_path / "pend_snapshot")
    shutil.copytree(pend, snap)
    n1 = promote_pending(spark, rel, pend, QI, k=K)
    assert n1 > 0
    released_after = sorted(
        read_ingest_zone(spark, rel).toPandas()["c_custkey"]
    )

    # crash rewind: restore the pre-rewrite pending zone
    shutil.rmtree(pend)
    shutil.copytree(snap, pend)
    n2 = promote_pending(spark, rel, pend, QI, k=K)
    assert n2 == n1  # same deterministic promote set
    assert (
        sorted(read_ingest_zone(spark, rel).toPandas()["c_custkey"])
        == released_after
    )  # no duplicates: the promo dir was overwritten, not appended


def test_sweep_is_safe_beside_a_live_stream(spark, tmp_path):
    # the sweep is a PERIODIC MAINTENANCE pass: running it between
    # micro-batches of a live stream must not lose pending rows. The
    # remainder lands in a batch_id namespace disjoint from stream ids
    # (2e6+), so the NEXT micro-batch's per-batch overwrite cannot
    # delete it — the regression here parked it at pend_max+1, exactly
    # the next stream batch id
    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)
    assert promote_pending(spark, rel, pend, QI, k=K) > 0

    # stream continues: batch 3 arrives (same checkpoint → next batch
    # id continues the counter the remainder must not collide with)
    extra = spark.createDataFrame(
        [(300 + i, 4, "FURNITURE") for i in range(2)],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(rows.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_k_anonymity_gate(
        stream, rel, pend, str(tmp_path / "ckpt"), QI, k=K
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # nothing dropped: release ∪ pending == every row ever ingested
    all_rows = sorted(
        rows.toPandas()["c_custkey"].tolist()
        + extra.toPandas()["c_custkey"].tolist()
    )
    got = sorted(
        read_ingest_zone(spark, rel).select("c_custkey")
        .union(read_ingest_zone(spark, pend).select("c_custkey"))
        .toPandas()["c_custkey"]
    )
    assert got == all_rows
    # and class C's 3 swept-remainder rows specifically survived
    pend_keys = set(read_ingest_zone(spark, pend).toPandas()["c_custkey"])
    assert {200, 201, 202} <= pend_keys


def _crash_on_nth_rename(monkeypatch, n: int):
    """Patch os.rename to raise on its n-th call (1-based)."""
    import os as _os

    real = _os.rename
    calls = {"i": 0}

    def bomb(src, dst):
        calls["i"] += 1
        if calls["i"] == n:
            raise OSError("injected crash")
        return real(src, dst)

    monkeypatch.setattr(_os, "rename", bomb)
    return calls


def test_sweep_crash_mid_swap_loses_nothing(spark, tmp_path, monkeypatch):
    # crash between the two renames: live pending dir is gone, the
    # remainder sits in __next — the worst window of the old
    # rmtree-then-rename swap (permanent row loss). The next sweep must
    # recover by completing the swap, and gate+sweep must still equal
    # the one-shot batch audit
    import os
    import pytest

    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)

    _crash_on_nth_rename(monkeypatch, 2)
    with pytest.raises(OSError, match="injected crash"):
        promote_pending(spark, rel, pend, QI, k=K)
    monkeypatch.undo()
    assert not os.path.exists(pend)  # the window is real
    assert os.path.exists(pend + "__next")

    # recovery: the next sweep restores the live dir first; the promote
    # set was already released, so it promotes nothing new
    assert promote_pending(spark, rel, pend, QI, k=K) == 0
    released = set(read_ingest_zone(spark, rel).toPandas()["c_custkey"])
    pending = set(read_ingest_zone(spark, pend).toPandas()["c_custkey"])
    eligible = rows.join(
        rows.groupBy(*QI).count().filter(F.col("count") >= K).select(*QI),
        QI,
        "left_semi",
    )
    assert released == set(eligible.toPandas()["c_custkey"])
    assert released | pending == set(rows.toPandas()["c_custkey"])
    assert not os.path.exists(pend + "__next")
    assert not os.path.exists(pend + "__old")


def test_sweep_crash_then_live_gate_write_loses_nothing(
    spark, tmp_path, monkeypatch
):
    # the COMBINED window: sweep crashes between the two renames
    # (pending gone, remainder in __next, pre-sweep state in __old) and
    # the LIVE GATE writes a micro-batch BEFORE the next sweep —
    # recreating pending_root. A recovery that keys only on
    # "pending_root missing" skips the restore and rmtree's both
    # siblings, permanently losing the non-promoted remainder. The fix
    # merges __next's batch dirs into the recreated pending_root (the
    # id namespaces are disjoint), so nothing is lost.
    import os
    import pytest

    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)

    _crash_on_nth_rename(monkeypatch, 2)
    with pytest.raises(OSError, match="injected crash"):
        promote_pending(spark, rel, pend, QI, k=K)
    monkeypatch.undo()
    assert not os.path.exists(pend)
    assert os.path.exists(pend + "__next")
    assert os.path.exists(pend + "__old")

    # the live gate beats recovery to the filesystem: batch 3 arrives
    # on the same checkpoint and the gate recreates pending_root
    extra = spark.createDataFrame(
        [(300 + i, 4, "FURNITURE") for i in range(2)],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(rows.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_k_anonymity_gate(
        stream, rel, pend, str(tmp_path / "ckpt"), QI, k=K
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert os.path.exists(pend)  # recreated by the gate mid-window

    # the next sweep must recognize the interrupted swap (both siblings
    # present beside a live pending_root) and MERGE the remainder back
    promote_pending(spark, rel, pend, QI, k=K)
    released = set(read_ingest_zone(spark, rel).toPandas()["c_custkey"])
    pending = set(read_ingest_zone(spark, pend).toPandas()["c_custkey"])
    # nothing lost, nothing duplicated: release ∪ pending == every row
    all_rows = set(rows.toPandas()["c_custkey"]) | set(
        extra.toPandas()["c_custkey"]
    )
    assert released | pending == all_rows
    assert not (released & pending)
    # class C's non-promoted remainder specifically survived the window
    assert {200, 201, 202} <= pending
    # and the gate's mid-window micro-batch rows are present too
    assert {300, 301} <= pending
    assert not os.path.exists(pend + "__next")
    assert not os.path.exists(pend + "__old")


def test_sweep_crash_before_swap_loses_nothing(spark, tmp_path, monkeypatch):
    # crash after the staging write but before any rename: the live
    # pending dir is intact and __next is an orphan — the next sweep
    # must clear the stale staging dir and complete normally
    import os
    import pytest

    rows = _rows(spark)
    src = _staged_source(spark, tmp_path, rows)
    rel, pend = _run_gate(spark, tmp_path, rows, src)

    _crash_on_nth_rename(monkeypatch, 1)
    with pytest.raises(OSError, match="injected crash"):
        promote_pending(spark, rel, pend, QI, k=K)
    monkeypatch.undo()
    assert os.path.exists(pend)
    assert os.path.exists(pend + "__next")

    # the release write landed before the crash; the re-run recomputes
    # the SAME deterministic promo dir (overwrite, not duplicate) and
    # finishes the pending rewrite
    promote_pending(spark, rel, pend, QI, k=K)
    released = read_ingest_zone(spark, rel)
    assert released.groupBy("c_custkey").count().filter(
        F.col("count") > 1
    ).isEmpty()
    eligible = rows.join(
        rows.groupBy(*QI).count().filter(F.col("count") >= K).select(*QI),
        QI,
        "left_semi",
    )
    assert set(released.toPandas()["c_custkey"]) == set(
        eligible.toPandas()["c_custkey"]
    )
    pclasses = read_ingest_zone(spark, pend).groupBy(*QI).count().collect()
    assert all(r["count"] < K for r in pclasses)
    assert not os.path.exists(pend + "__next")
