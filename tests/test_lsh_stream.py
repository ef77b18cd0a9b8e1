"""Streaming incremental LSH dedup: micro-batches screen against the
persisted band index (never the raw historical corpus), within-batch
near-dups collapse, and crash replay is idempotent."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from data_lake_spark.streaming.incremental import start_lsh_dedup_ingest

_BASE = (
    "the quick brown fox jumps over the lazy dog while rain falls on the plain"
)
_OTHER = (
    "completely different text about spark engines shuffling partitions at scale"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _write_batches(tmp_path, batches):
    src = str(tmp_path / "src")
    now = time.time()
    for i, b in enumerate(batches):
        before = set(glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f, (now - 60 + 30 * i,) * 2)
    return src


def test_streaming_lsh_dedup(spark, tmp_path):
    # batch 1: two distinct docs. batch 2: a near-copy of doc 1 (one
    # word changed), a novel doc, and an exact in-batch copy of it.
    b1 = _docs(spark, [(1, _BASE), (2, _OTHER)])
    b2 = _docs(
        spark,
        [
            (3, _BASE.replace("plain", "coast")),
            (4, "fresh unseen material covering streaming state stores deeply"),
            (5, "fresh unseen material covering streaming state stores deeply"),
        ],
    )
    src = _write_batches(tmp_path, [b1, b2])
    accepted_root = str(tmp_path / "accepted")
    index_root = str(tmp_path / "index")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_lsh_dedup_ingest(
        stream,
        accepted_root,
        index_root,
        checkpoint=str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    accepted = {
        r.doc_id for r in spark.read.parquet(accepted_root).collect()
    }
    assert accepted == {1, 2, 4}  # 3 = history near-dup, 5 = in-batch dup

    # the index holds bands only for accepted docs, partitioned by band
    idx = spark.read.parquet(index_root)
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} == {
        1,
        2,
        4,
    }
    files = [
        r[0]
        for r in idx.filter(F.col("band_idx") == 0)
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert files and all("band_idx=0" in f for f in files)

    # replay idempotency: re-running the whole source against a FRESH
    # checkpoint (the worst-case total replay) republishes the same
    # accepted set — per-batch overwrite, no duplicates
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = start_lsh_dedup_ingest(
        stream2,
        accepted_root,
        index_root,
        checkpoint=str(tmp_path / "ckpt2"),
        threshold=0.5,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = [r.doc_id for r in spark.read.parquet(accepted_root).collect()]
    assert sorted(again) == [1, 2, 4]
