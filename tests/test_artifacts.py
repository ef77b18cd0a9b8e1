"""The deterministic artifact store: same source data reuses the
finished artifact (across "processes" — i.e. with no in-memory state),
regenerated source data retrains, and a crashed write (no _SUCCESS) is
retried rather than served half-finished."""

from __future__ import annotations

import os
import shutil
import time

from data_lake_spark.artifacts import artifact_path, stored_artifact

TABLES = ["documents"]


def _write_source(spark, sf_dir, n):
    spark.range(n).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS text"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )


def test_reuse_retrain_and_crash_retry(spark, tmp_path, monkeypatch):
    sf_dir = str(tmp_path / "sf")
    store = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", store)
    _write_source(spark, sf_dir, 10)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).selectExpr("id AS k", "id * 2 AS v")

    a = stored_artifact(spark, sf_dir, "toy", TABLES, build)
    assert calls["n"] == 1 and a.count() == 3
    # second call — and any NEW process, since no in-memory state is
    # involved — finds the finished artifact and does not retrain
    stored_artifact(spark, sf_dir, "toy", TABLES, build).collect()
    assert calls["n"] == 1

    # regenerating the source data changes the fingerprint → new path,
    # retrain (the stale-artifact hazard of the old mkdtemp cache)
    p1 = artifact_path(sf_dir, "toy", TABLES)
    time.sleep(0.05)  # ensure a distinct mtime_ns on fast filesystems
    _write_source(spark, sf_dir, 20)
    p2 = artifact_path(sf_dir, "toy", TABLES)
    assert p1 != p2
    stored_artifact(spark, sf_dir, "toy", TABLES, build).collect()
    assert calls["n"] == 2

    # a crashed write leaves no _SUCCESS: the next call retries the
    # build instead of reading a partial artifact
    os.remove(os.path.join(p2, "_SUCCESS"))
    stored_artifact(spark, sf_dir, "toy", TABLES, build).collect()
    assert calls["n"] == 3
    assert os.path.exists(os.path.join(p2, "_SUCCESS"))

    # distinct kinds for the same source never collide
    assert artifact_path(sf_dir, "other", TABLES) != p2
    # the builder-format version salts the path: a code change that
    # alters the artifact's VALUES (same source data) must retrain,
    # not serve the old artifact — the r8 PCA-rescale lesson
    assert artifact_path(sf_dir, "toy", TABLES, version="2") != p2
    stored_artifact(spark, sf_dir, "toy", TABLES, build, version="2")
    assert calls["n"] == 4
    shutil.rmtree(store, ignore_errors=True)


def test_concurrent_build_race_is_publish_by_rename_safe(
    spark, tmp_path, monkeypatch
):
    # simulate losing the race: another process commits the artifact
    # WHILE this one is building — the loser must discard its staging
    # dir and serve the winner's rows, never clobber them
    import os

    sf_dir = str(tmp_path / "sf")
    store = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", store)
    _write_source(spark, sf_dir, 10)
    path = artifact_path(sf_dir, "race", TABLES)

    def winner_then_build():
        # the "other process" publishes first, mid-build
        spark.range(2).selectExpr("id AS k", "id AS v").write.mode(
            "overwrite"
        ).parquet(path)
        return spark.range(9).selectExpr("id AS k", "id AS v")

    got = stored_artifact(spark, sf_dir, "race", TABLES, winner_then_build)
    assert got.count() == 2  # the winner's artifact survived
    assert not [
        d for d in os.listdir(store) if d.startswith("race") and ".tmp-" in d
    ]  # the loser's staging dir was discarded


def test_failed_build_cleans_staging_and_husk_is_moved_not_deleted(
    spark, tmp_path, monkeypatch
):
    # round-8 advice: a build() exception used to leak the staging
    # dir, and an uncommitted husk at the final path was rmtree'd in
    # place (a TOCTOU against a competitor's just-committed artifact)
    sf_dir = str(tmp_path / "sf")
    store = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", store)
    _write_source(spark, sf_dir, 10)
    path = artifact_path(sf_dir, "husk", TABLES)

    def boom():
        raise RuntimeError("training failed")

    try:
        stored_artifact(spark, sf_dir, "husk", TABLES, boom)
    except RuntimeError:
        pass
    assert not [d for d in os.listdir(store) if ".tmp-" in d]

    # plant an uncommitted husk (pre-rename crash of a legacy writer):
    # publish must still succeed and leave no husk dirs behind
    os.makedirs(path)
    with open(os.path.join(path, "part-stale.parquet"), "w") as f:
        f.write("not a parquet file")

    def build():
        return spark.range(4).selectExpr("id AS k", "id AS v")

    got = stored_artifact(spark, sf_dir, "husk", TABLES, build)
    assert got.count() == 4
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not [
        d for d in os.listdir(store) if ".tmp-" in d or ".husk-" in d
    ]


def test_committed_husk_is_restored_not_rebuilt(spark, tmp_path, monkeypatch):
    # a committed artifact parked aside by a lost publish race must be
    # found and renamed back before any retrain (round-9 advice)
    sf_dir = str(tmp_path / "sf")
    store = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", store)
    _write_source(spark, sf_dir, 10)
    path = artifact_path(sf_dir, "restore", TABLES)

    def build():
        return spark.range(3).selectExpr("id AS k", "id * 2 AS v")

    stored_artifact(spark, sf_dir, "restore", TABLES, build)
    # park the committed artifact aside, as _publish's corner does
    os.rename(path, f"{path}.husk-99999")

    def never():
        raise AssertionError("retrained despite a committed husk on disk")

    got = stored_artifact(spark, sf_dir, "restore", TABLES, never)
    assert got.count() == 3
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not [d for d in os.listdir(store) if ".husk-" in d]


def test_three_writer_race_never_deletes_the_committed_copy(
    spark, tmp_path, monkeypatch
):
    # round-9 advice: when BOTH restore renames lose to a reoccupying
    # uncommitted husk, the old code rmtree'd the aside dir — the only
    # committed copy. The guard now leaves a committed aside on disk.
    from data_lake_spark.artifacts import _publish, _restore_committed_husk

    store = str(tmp_path / "store")
    os.makedirs(store)
    path = os.path.join(store, "art_x")
    marker = os.path.join(path, "_SUCCESS")
    aside = f"{path}.husk-{os.getpid()}"

    # competitor's JUST-committed artifact occupies the final path...
    os.makedirs(path)
    open(os.path.join(path, "part-c.parquet"), "w").write("C")
    open(marker, "w").close()
    # ...and our staging dir holds a complete write of the same digest
    staging = f"{path}.tmp-{os.getpid()}"
    os.makedirs(staging)
    open(os.path.join(staging, "part-s.parquet"), "w").write("S")
    open(os.path.join(staging, "_SUCCESS"), "w").close()

    real_exists, real_rename = os.path.exists, os.rename
    marker_misses = {"n": 2}  # the competitor commits between our checks

    def fake_exists(p):
        if p == marker and marker_misses["n"] > 0:
            marker_misses["n"] -= 1
            return False
        return real_exists(p)

    def fake_rename(src, dst):
        if src == aside and dst == path:
            # reoccupation: an uncommitted husk grabs the path first
            if not real_exists(path):
                os.makedirs(path)
                open(os.path.join(path, "junk"), "w").write("j")
            raise OSError("path reoccupied")
        return real_rename(src, dst)

    monkeypatch.setattr(os.path, "exists", fake_exists)
    monkeypatch.setattr(os, "rename", fake_rename)
    _publish(staging, path, marker)
    monkeypatch.undo()

    # the committed copy survived — parked aside, never rmtree'd
    assert os.path.exists(os.path.join(aside, "_SUCCESS"))
    # recovery: the sweep itself clears the uncommitted junk occupant
    # (a marker-less dir at the final path is a husk by construction)
    # and restores the committed copy — no manual cleanup needed
    _restore_committed_husk(path, marker)
    assert os.path.exists(marker)
    assert open(os.path.join(path, "part-c.parquet")).read() == "C"
    assert not os.path.exists(aside)
