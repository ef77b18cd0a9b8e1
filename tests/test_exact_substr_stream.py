"""Streaming ExactSubstr gram-index ingest: per-batch mergeable
partials fold to the exact batch-rebuild keeper index (stream == batch
span-set bit-identity), history screening costs the inverted index,
and crash replay is idempotent (the test_lsh_stream conventions)."""

from __future__ import annotations

import glob
import os
import shutil
import time

from data_lake_spark.operators.textdedup import (
    exact_substr_spans,
    exact_substr_spans_from_index,
)
from data_lake_spark.streaming.incremental import (
    read_gram_index,
    start_gram_index_ingest,
)

_K = 4
_MIN = 6

_RUN = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token dup run
_DOCS = [
    # doc 1 holds the canonical occurrence of the run
    (1, _RUN + " unique tail one two three"),
    # doc 2 repeats the run mid-document (span expected here)
    (2, "lead in words " + _RUN + " trailing words here"),
    # doc 3 repeats it at the start (span expected here)
    (3, _RUN + " something else entirely follows now"),
    # doc 4 shares nothing long enough
    (4, "totally different tokens with no repeated run at all"),
    # doc 5 repeats doc 4's text verbatim (whole-doc span expected)
    (5, "totally different tokens with no repeated run at all"),
]


def _docs_df(spark, rows):
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


def _run_ingest(spark, tmp_path, src):
    index_root = str(tmp_path / "gram_index")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_gram_index_ingest(
        stream, index_root, str(tmp_path / "ckpt"), k=_K
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return index_root


def _span_set(df):
    return {
        (r["doc_id"], r["span_start"], r["span_tokens"]) for r in df.collect()
    }


def test_stream_index_equals_batch_rebuild(spark, tmp_path):
    docs = _docs_df(spark, _DOCS)
    # stream in two micro-batches split so the duplicated run CROSSES
    # the batch boundary (docs 1,4 then 2,3,5): only a genuinely merged
    # index can see those duplicates
    b1 = docs.filter("doc_id IN (1, 4)")
    b2 = docs.filter("doc_id IN (2, 3, 5)")
    src = _write_batches(tmp_path, [b1, b2])
    index_root = _run_ingest(spark, tmp_path, src)

    index = read_gram_index(spark, index_root)
    got = exact_substr_spans_from_index(docs, index, k=_K, min_tokens=_MIN)
    want = exact_substr_spans(docs, k=_K, min_tokens=_MIN)
    want_set = _span_set(want)
    assert _span_set(got) == want_set and want_set  # identical AND non-trivial
    # the expected shape: non-keeper occurrences in docs 2, 3, and 5
    assert {d for (d, _, _) in want_set} == {2, 3, 5}


def test_new_batch_screens_against_history(spark, tmp_path):
    # index the first four docs, then screen doc 5 (an exact copy of
    # doc 4) against history + itself: fold the historical index with
    # doc 5's own partials — the incremental path never re-reads the
    # historical corpus text
    hist = _docs_df(spark, _DOCS[:4])
    src = _write_batches(
        tmp_path, [hist.filter("doc_id IN (1, 4)"), hist.filter("doc_id IN (2, 3)")]
    )
    index_root = _run_ingest(spark, tmp_path, src)

    # doc 5 arrives later on the SAME source + checkpoint, so its batch
    # id continues the counter (a fresh checkpoint would restart at 0
    # and overwrite historical partials — the ids are the ledger)
    new_doc = _docs_df(spark, _DOCS[4:])
    new_doc.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_gram_index_ingest(
        stream, index_root, str(tmp_path / "ckpt"), k=_K
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    index = read_gram_index(spark, index_root)
    spans = exact_substr_spans_from_index(
        new_doc, index, k=_K, min_tokens=_MIN
    )
    # doc 5 duplicates doc 4 (indexed earlier) in full: one whole-doc span
    rows = spans.collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 5 and rows[0]["span_start"] == 0
    assert rows[0]["span_tokens"] == len(_DOCS[4][1].split(" "))


def test_replay_is_idempotent(spark, tmp_path):
    docs = _docs_df(spark, _DOCS)
    src = _write_batches(
        tmp_path, [docs.filter("doc_id IN (1, 4)"), docs.filter("doc_id IN (2, 3, 5)")]
    )
    index_root = _run_ingest(spark, tmp_path, src)
    index_before = sorted(
        read_gram_index(spark, index_root).collect(),
        key=lambda r: r["h"],
    )

    # wipe the checkpoint and replay the same source: per-batch
    # overwrite dirs republish identical partials — SUM-merge cannot
    # double count
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    _run_ingest(spark, tmp_path, src)
    index_after = sorted(
        read_gram_index(spark, index_root).collect(),
        key=lambda r: r["h"],
    )
    assert index_before == index_after


def test_compaction_preserves_the_index_and_is_crash_safe(spark, tmp_path):
    import glob
    import os
    import shutil

    from data_lake_spark.streaming.incremental import (
        _GRAM_COMPACT_NS,
        compact_gram_index,
    )

    docs = _docs_df(spark, _DOCS)
    src = _write_batches(
        tmp_path, [docs.filter("doc_id IN (1, 4)"), docs.filter("doc_id IN (2, 3, 5)")]
    )
    index_root = _run_ingest(spark, tmp_path, src)
    before = sorted(
        read_gram_index(spark, index_root).collect(), key=lambda r: r["h"]
    )

    # compaction folds only DURABLY COMMITTED dirs — every stream id
    # strictly below the max (which a checkpoint replay may still be
    # rewriting in place): here that is batch 0 alone; batch 1 stays
    # live beside the compacted dir and the reader sees NOTHING change
    assert compact_gram_index(spark, index_root) == 1
    dirs = sorted(glob.glob(str(index_root) + "/batch_id=*"))
    assert len(dirs) == 2
    assert any(d.endswith(f"batch_id={_GRAM_COMPACT_NS}") for d in dirs)
    assert any(d.endswith("batch_id=1") for d in dirs)
    assert (
        sorted(read_gram_index(spark, index_root).collect(), key=lambda r: r["h"])
        == before
    )
    # idempotent: batch 1 is still the max stream dir, nothing durable
    assert compact_gram_index(spark, index_root) == 0

    # the stream continues: batch 2 arrives on the same checkpoint
    extra = _docs_df(spark, [(6, _RUN + " yet another repeat of the run")])
    extra.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_gram_index_ingest(
        stream, index_root, str(tmp_path / "ckpt"), k=_K
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    all_docs = docs.unionByName(extra)
    got = exact_substr_spans_from_index(
        all_docs, read_gram_index(spark, index_root), k=_K, min_tokens=_MIN
    )
    want = exact_substr_spans(all_docs, k=_K, min_tokens=_MIN)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    # with batch 2 now the max, batch 1 + the old compaction become
    # durably foldable (2 dirs); batch 2 itself stays live
    assert compact_gram_index(spark, index_root) == 2
    dirs = sorted(glob.glob(str(index_root) + "/batch_id=*"))
    assert len(dirs) == 2
    assert any(d.endswith(f"batch_id={_GRAM_COMPACT_NS + 1}") for d in dirs)
    assert any(d.endswith("batch_id=2") for d in dirs)

    # crash window: a second compaction that wrote its dir but died
    # before deleting the superseded ones — readers must ignore the
    # leftovers (no double count), and the next compaction cleans up
    snap = sorted(
        read_gram_index(spark, index_root).collect(), key=lambda r: r["h"]
    )
    merged = read_gram_index(spark, index_root)
    merged.write.mode("overwrite").parquet(
        f"{index_root}/batch_id={_GRAM_COMPACT_NS + 2}"
    )  # the new compaction landed; superseded dirs still present
    assert (
        sorted(read_gram_index(spark, index_root).collect(), key=lambda r: r["h"])
        == snap
    )
    assert compact_gram_index(spark, index_root) == 0  # finishes deletion
    dirs = glob.glob(str(index_root) + "/batch_id=*")
    assert len(dirs) == 1 and f"batch_id={_GRAM_COMPACT_NS + 2}" in dirs[0]
    assert (
        sorted(read_gram_index(spark, index_root).collect(), key=lambda r: r["h"])
        == snap
    )


def test_compaction_never_bakes_an_in_flight_replay(spark, tmp_path):
    """A crashed micro-batch is REPLAYED as an overwrite of the max
    stream dir. If compaction ran mid-rewrite it would fold partial
    content and then supersede the completed replay — grams lost. The
    fix: the max stream id is never folded, so the replay's overwrite
    lands on a still-live dir and the index converges to the exact
    batch rebuild."""
    from data_lake_spark.streaming.incremental import compact_gram_index

    docs = _docs_df(spark, _DOCS)
    src = _write_batches(
        tmp_path,
        [docs.filter("doc_id IN (1, 4)"), docs.filter("doc_id IN (2, 3, 5)")],
    )
    index_root = _run_ingest(spark, tmp_path, src)

    # snapshot batch 1's COMPLETE partials, then simulate the replay
    # mid-flight: the dir holds only half its rows (overwrite started,
    # not finished)
    b1_df = spark.read.parquet(f"{index_root}/batch_id=1")
    b1_schema = b1_df.schema
    full_b1 = b1_df.collect()
    assert len(full_b1) > 1
    partial = spark.createDataFrame(full_b1[: len(full_b1) // 2], b1_schema)
    partial.write.mode("overwrite").parquet(f"{index_root}/batch_id=1")

    # compaction beside the in-flight replay folds ONLY batch 0 — the
    # partial dir is the max stream id, excluded by construction
    assert compact_gram_index(spark, index_root) == 1
    dirs = sorted(glob.glob(str(index_root) + "/batch_id=*"))
    assert any(d.endswith("batch_id=1") for d in dirs)

    # the replay completes its overwrite (checkpoint then commits)
    spark.createDataFrame(full_b1, b1_schema).write.mode(
        "overwrite"
    ).parquet(f"{index_root}/batch_id=1")

    # nothing was lost: the folded index equals the one-shot rebuild
    got = exact_substr_spans_from_index(
        docs, read_gram_index(spark, index_root), k=_K, min_tokens=_MIN
    )
    want = exact_substr_spans(docs, k=_K, min_tokens=_MIN)
    want_set = _span_set(want)
    assert _span_set(got) == want_set and want_set
