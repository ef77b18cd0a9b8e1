"""Streaming dHash index ingest: per-batch screens against the
persisted hash index produce EXACTLY the one-shot batch pair set
(stream == batch across batch boundaries), history is screened at
inverted-index cost, and crash replay is idempotent (the
test_exact_substr_stream conventions applied to the image column)."""

from __future__ import annotations

import glob
import os
import shutil
import time

from data_lake_spark.operators.imagehash import (
    bmp_from_text_col,
    dhash_table,
    hamming_pairs,
)
from data_lake_spark.streaming.incremental import (
    read_dhash_pairs,
    start_dhash_index_ingest,
)

_BASE = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 16
_DOCS = [
    (1, _BASE),
    (2, _BASE[:100] + "X" + _BASE[101:]),  # near-dup of 1
    (3, "zz entirely different pixel payload content words here " * 16),
    (4, _BASE[:300] + "Q" + _BASE[301:]),  # near-dup of 1 and 2
    (5, "another unrelated document body with its own bytes " * 16),
]


def _media_df(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return bmp_from_text_col(docs)


def _write_batches(tmp_path, batches):
    src = str(tmp_path / "src")
    now = time.time()
    for i, b in enumerate(batches):
        before = set(glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f, (now - 60 + 30 * i,) * 2)
    return src


def _run_ingest(spark, tmp_path, src, schema):
    pairs_root = str(tmp_path / "pairs")
    index_root = str(tmp_path / "index")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_dhash_index_ingest(
        stream, pairs_root, index_root, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return pairs_root, index_root


def _pair_set(df):
    return {
        (r["media_a"], r["media_b"], r["hamming"]) for r in df.collect()
    }


def test_stream_pairs_equal_batch_pairs_across_boundaries(spark, tmp_path):
    media = _media_df(spark, _DOCS)
    # split so every near-dup pair CROSSES the batch boundary (1, 3 then
    # 2, 4, 5): only a real history screen can find (1,2), (1,4)
    b1 = media.filter("media_id IN (1, 3)")
    b2 = media.filter("media_id IN (2, 4, 5)")
    src = _write_batches(tmp_path, [b1, b2])
    pairs_root, _ = _run_ingest(spark, tmp_path, src, media.schema)

    got = _pair_set(read_dhash_pairs(spark, pairs_root))
    want = _pair_set(hamming_pairs(dhash_table(media)))
    assert got == want and want  # identical AND non-trivial
    # the planted family: 1~2, 1~4, 2~4 — all cross-batch or in-batch
    assert {(a, b) for (a, b, _) in want} == {(1, 2), (1, 4), (2, 4)}


def test_history_is_screened_not_redecoded(spark, tmp_path):
    # index the first four images, then stream image 2's near-dup
    # family member later on the SAME checkpoint: its pairs against
    # history come from the persisted (media_id, dhash) index — the
    # batch containing images 1 and 4 is never re-read
    media = _media_df(spark, _DOCS)
    hist = media.filter("media_id IN (1, 3, 5)")
    src = _write_batches(tmp_path, [hist])
    pairs_root, index_root = _run_ingest(spark, tmp_path, src, media.schema)
    assert _pair_set(read_dhash_pairs(spark, pairs_root)) == set()

    late = media.filter("media_id IN (2, 4)")
    late.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(media.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_dhash_index_ingest(
        stream, pairs_root, index_root, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _pair_set(read_dhash_pairs(spark, pairs_root))
    assert {(a, b) for (a, b, _) in got} == {(1, 2), (1, 4), (2, 4)}


def test_audio_stream_pairs_equal_batch_pairs(spark, tmp_path):
    # the audio twin rides the same worker: envelope fingerprints over
    # synthesized WAVs, pair set identical to the batch audio_pairs
    from data_lake_spark.operators.audiofp import (
        audio_pairs,
        wav_from_text_col,
    )
    from data_lake_spark.streaming.incremental import (
        start_audiofp_index_ingest,
    )

    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    media = wav_from_text_col(docs)
    b1 = media.filter("media_id IN (1, 3)")
    b2 = media.filter("media_id IN (2, 4, 5)")
    src = _write_batches(tmp_path, [b1, b2])
    pairs_root = str(tmp_path / "apairs")
    stream = (
        spark.readStream.schema(media.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_audiofp_index_ingest(
        stream, pairs_root, str(tmp_path / "aindex"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _pair_set(read_dhash_pairs(spark, pairs_root))
    want = _pair_set(audio_pairs(media))
    assert got == want and want


def test_video_gram_ingest_spans_equal_batch(spark, tmp_path):
    # recut-clip detection incrementally: stream videos in two batches
    # (the offset clip arriving AFTER its source), fold the frame-gram
    # index, and derive spans — must equal the one-shot batch operator
    from data_lake_spark.operators.textdedup import (
        exact_substr_spans_from_index,
    )
    from data_lake_spark.operators.videofp import (
        avi_from_text_col,
        frame_token_docs,
        video_clip_spans,
    )
    from data_lake_spark.streaming.incremental import (
        read_gram_index,
        start_video_gram_ingest,
    )

    total = 4 * 768
    base = ("source reel lorem ipsum frame payload words " * 80)[:total]
    clip = base[768:total] + ("zz fresh tail content " * 60)[:768]
    other = ("unrelated clip body " * 80)[:total]
    docs = spark.createDataFrame(
        [(1, base), (2, clip), (3, other)], "doc_id long, text string"
    )
    media = avi_from_text_col(docs)
    src = _write_batches(
        tmp_path,
        [media.filter("media_id IN (1, 3)"), media.filter("media_id = 2")],
    )
    index_root = str(tmp_path / "vgrams")
    stream = (
        spark.readStream.schema(media.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_video_gram_ingest(stream, index_root, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    tok_docs = frame_token_docs(media)
    got = exact_substr_spans_from_index(
        tok_docs, read_gram_index(spark, index_root), k=2, min_tokens=2
    ).select("doc_id", "span_start", "span_tokens")
    want = video_clip_spans(media, min_frames=2)
    g = {(r[0], r[1], r[2]) for r in got.collect()}
    w = {(r["media_id"], r["span_start"], r["span_frames"]) for r in want.collect()}
    assert g == w and w == {(2, 0, 3)}  # the offset clip, found both ways


def test_replay_is_idempotent(spark, tmp_path):
    media = _media_df(spark, _DOCS)
    src = _write_batches(
        tmp_path,
        [media.filter("media_id IN (1, 3)"), media.filter("media_id IN (2, 4, 5)")],
    )
    pairs_root, index_root = _run_ingest(spark, tmp_path, src, media.schema)
    before_pairs = _pair_set(read_dhash_pairs(spark, pairs_root))
    before_index = sorted(
        (r["media_id"], r["dhash"])
        for r in spark.read.parquet(index_root).select(
            "media_id", "dhash"
        ).collect()
    )

    # wipe the checkpoint and replay the same source: per-batch
    # overwrite dirs republish identical pairs/hashes, and the
    # batch_id < current screen shows each replayed batch exactly the
    # state the original saw — nothing duplicated, nothing new
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
    _run_ingest(spark, tmp_path, src, media.schema)
    assert _pair_set(read_dhash_pairs(spark, pairs_root)) == before_pairs
    after_index = sorted(
        (r["media_id"], r["dhash"])
        for r in spark.read.parquet(index_root).select(
            "media_id", "dhash"
        ).collect()
    )
    assert after_index == before_index
