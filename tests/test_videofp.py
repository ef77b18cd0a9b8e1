"""Perceptual video dedup: real RIFF/AVI frame extraction (round-trip
vs the pure-JVM synthesis, hand-checked against the image kernel),
planted frame-aligned near-dups through the banded machinery, the
every-frame refine (one very different frame kills the pair), keeper
assignment, and real AVI metadata in decode_media — the
test_imagehash/test_audiofp conventions on the video column."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from data_lake_spark.operators.imagehash import dhash64
from data_lake_spark.operators.videofp import (
    _FRAME_BYTES,
    _N_FRAMES,
    avi_frames,
    avi_from_text_col,
    avi_info,
    dedup_videos,
    frame_hash_table,
    video_pairs,
)

_TOTAL = _N_FRAMES * _FRAME_BYTES  # 3072 text bytes per clip


def _clip_text(seed: str) -> str:
    return (seed + " lorem ipsum frame payload words ") * 60


def test_synthesis_roundtrip_and_frame_hashes_match_image_kernel(spark):
    docs = spark.createDataFrame(
        [(1, _clip_text("alpha"))], "doc_id long, text string"
    )
    content = bytes(avi_from_text_col(docs).collect()[0]["content"])
    assert avi_info(content) == (16, 16, _N_FRAMES)
    frames = avi_frames(content)
    assert frames is not None and len(frames) == _N_FRAMES
    # each extracted frame is a valid BMP whose dHash the IMAGE kernel
    # computes — one hash definition across stills and frames
    want = [dhash64(f) for f in frames]
    assert all(h is not None for h in want)

    got = frame_hash_table(avi_from_text_col(docs)).collect()
    by_idx = {r["frame_idx"]: r["dhash"] for r in got}
    signed = [h - (1 << 64) if h >= 1 << 63 else h for h in want]
    assert [by_idx[i] for i in range(_N_FRAMES)] == signed


def test_parser_edges():
    assert avi_frames(b"not a video") is None
    assert avi_info(b"RIFFxxxxWAVE") is None  # a WAV is not an AVI
    # compressed stream ('00dc' chunks): frames extract to nothing
    from data_lake_spark.operators.videofp import _AVI_PREFIX

    compressed = _AVI_PREFIX + (
        b"00dc" + struct.pack("<I", 8) + b"x" * 8
    )
    assert avi_frames(compressed) is None
    # truncated final frame chunk clamps instead of crashing
    full = _AVI_PREFIX + (
        b"00db" + struct.pack("<I", _FRAME_BYTES) + b" " * _FRAME_BYTES
    )
    cut = full[:-100]
    frames = avi_frames(cut)  # short payload -> dhash64 returns None
    assert frames is None or all(dhash64(f) is None for f in frames)


def test_deeply_nested_lists_degrade_to_none_not_recursion_error():
    # adversarial container: ~2000 nested LIST chunks in ~24KB used to
    # blow the recursive walk with RecursionError, crashing the whole
    # mapInPandas task; the iterative walk returns None like any other
    # undecodable content
    depth = 2000
    inner = b""
    for _ in range(depth):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"movi" + inner
    evil = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    assert avi_frames(evil) is None
    assert avi_info(evil) is None


def test_undecodable_yields_null_row(spark):
    media = spark.createDataFrame(
        [(1, b"garbage"), (2, None)], "media_id long, content binary"
    )
    rows = frame_hash_table(media).collect()
    got = {r["media_id"]: (r["frame_idx"], r["dhash"]) for r in rows}
    assert got == {1: (None, None), 2: (None, None)}


def test_planted_near_dup_videos_pair_and_distinct_do_not(spark):
    base = _clip_text("base")
    nearly = base[:700] + "X" + base[701:]  # one pixel in frame 0
    other = _clip_text("zz completely different content")
    docs = spark.createDataFrame(
        [(1, base), (2, nearly), (3, other)], "doc_id long, text string"
    )
    pairs = video_pairs(avi_from_text_col(docs), max_hamming=6).collect()
    got = {(r["media_a"], r["media_b"]): r for r in pairs}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)]["n_frames"] == _N_FRAMES
    assert got[(1, 2)]["max_frame_hamming"] <= 2


def test_one_very_different_frame_kills_the_pair(spark):
    # same first three frames, completely different last frame: the
    # banded candidates WILL surface the pair (aligned frames 0-2
    # collide), but the every-frame refine must reject it
    base = _clip_text("base")
    swapped = base[: 3 * _FRAME_BYTES] + _clip_text("qq other tail")[
        3 * _FRAME_BYTES : _TOTAL
    ]
    docs = spark.createDataFrame(
        [(1, base), (2, swapped)], "doc_id long, text string"
    )
    pairs = video_pairs(avi_from_text_col(docs), max_hamming=6).collect()
    assert pairs == []


def test_dedup_videos_keeper_assignment(spark):
    base = _clip_text("family")
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base[:50] + "Y" + base[51:]),  # near-dup of 1
            (3, _clip_text("standalone recording")),
            (4, None),  # NULL -> undecodable -> own keeper
        ],
        "doc_id long, text string",
    )
    media = avi_from_text_col(docs)
    out = {
        r["media_id"]: (r["keeper"], r["is_dup"])
        for r in dedup_videos(media, max_hamming=6).collect()
    }
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3] == (3, False)
    assert out[4] == (4, False)


def test_video_clip_spans_finds_offset_clips(spark):
    # video 2's frames 0..2 are video 1's frames 1..3 (a recut clip at
    # a DIFFERENT offset): frame-aligned video_pairs cannot see it, the
    # ExactSubstr-over-frame-tokens operator must — reported as video
    # 2's non-canonical 3-frame run at frame 0 (video 1 holds the
    # keeper occurrence)
    from data_lake_spark.operators.videofp import video_clip_spans

    # pad to EXACTLY the synthesized payload length so the shifted
    # construction stays frame-exact (the AVI synthesis space-pads
    # shorter texts, which would desynchronize frame boundaries)
    a = (_clip_text("source reel") + " " * _TOTAL)[:_TOTAL]
    b = (
        a[_FRAME_BYTES:_TOTAL]
        + (_clip_text("zz fresh tail") + " " * _TOTAL)[:_FRAME_BYTES]
    )
    c = (_clip_text("unrelated clip") + " " * _TOTAL)[:_TOTAL]
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    spans = video_clip_spans(avi_from_text_col(docs), min_frames=2).collect()
    got = {(r["media_id"], r["span_start"], r["span_frames"]) for r in spans}
    assert got == {(2, 0, 3)}
    # frame-aligned pairs indeed see nothing (different offsets)
    assert video_pairs(avi_from_text_col(docs), max_hamming=6).count() == 0


def test_decode_media_real_video_metadata(spark):
    from data_lake_spark.operators.multimodal import decode_media

    docs = spark.createDataFrame(
        [(7, _clip_text("clip"))], "doc_id long, text string"
    )
    media = avi_from_text_col(docs).select(
        "media_id", F.lit("video").alias("kind"), "content"
    )
    row = decode_media(media).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (16, 16, _N_FRAMES)


def test_non_ascii_text_still_emits_declared_chunk_sizes(spark):
    # round-8 advice: char-based substring + UTF-8 encode emitted MORE
    # bytes than the fixed RIFF/BMP headers declared on non-ASCII text,
    # silently misframing frames. ascii_text deletes non-ASCII
    # codepoints before slicing, so bytes == chars always.
    from data_lake_spark.operators.audiofp import wav_from_text_col
    from data_lake_spark.operators.imagehash import bmp_from_text_col

    txt = ("héllo wörld é世界 \U0001f600 " + "abc def ") * 200
    docs = spark.createDataFrame([(1, txt)], "doc_id long, text string")

    avi = bytes(avi_from_text_col(docs).collect()[0]["content"])
    assert avi_info(avi) == (16, 16, _N_FRAMES)
    frames = avi_frames(avi)
    assert frames is not None and len(frames) == _N_FRAMES
    assert all(dhash64(f) is not None for f in frames)

    wav = bytes(wav_from_text_col(docs).collect()[0]["content"])
    assert len(wav) == 44 + 1040  # header + declared data size, exactly

    bmp = bytes(bmp_from_text_col(docs).collect()[0]["content"])
    assert dhash64(bmp) is not None
    assert len(bmp) == 54 + 768
