"""Perceptual video dedup: REAL AVI container decode + per-frame dHash
+ the Hamming-banded pair machinery.

The third and last modality joins the near-dup family — text
(operators/textdedup.py), images (operators/imagehash.py), audio
(operators/audiofp.py), video (this module) — all on the ONE shared
topology: a single Arrow hash pass → banded inverted-index candidates →
exact refine → connected components.

The decode is REAL: a dependency-free RIFF/AVI walker (the WAV
argument one level up — an AVI is a RIFF tree whose 'movi' LIST holds
per-frame chunks). Uncompressed-DIB streams ('00db' chunks, raw
bottom-up BGR exactly like BMP pixel arrays) decode from bytes alone;
each frame is wrapped into a BMP header derived from the stream's
BITMAPINFOHEADER ('strf') and hashed with the EXISTING image kernel
(imagehash.dhash64) — one hash definition across stills and frames.
Compressed streams ('00dc') return no frames ⇒ NULL fingerprints, the
undecodable-content contract. Swapping ffmpeg in for compressed codecs
changes only the frame extraction; hashing, banding, and the join
topology are untouched.

Pair semantics: a video is its SEQUENCE of frame hashes. Candidates
come from any single frame's band collision (pigeonhole per frame:
two frame-aligned videos whose frame k differs by Hamming ≤ 7 always
collide on frame k); the refine requires EVERY aligned frame pair
within ``max_hamming`` and reports the worst frame distance — the
strict frame-aligned near-dup (re-encodes/brightness shifts), which is
what dedup wants; clip/subsequence detection is a different operator
(the textdedup partial-copy shape applied to frame hashes).

100 TB: one Arrow pass per video (Python touches each video once),
8·F tiny rows per video into the band shuffle, candidate count bounded
by bucket collisions + the hot-bucket cap, refine cost linear in
candidate pairs × frames, CC on the sparse verified edge set.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: synthesized clip geometry: 4 frames of 16×16 24-bit DIB (768-byte
#: raw BGR payloads, 48-byte rows — already 4-aligned, like the BMP
#: synthesis in imagehash)
_W = 16
_H = 16
_FRAME_BYTES = _W * 3 * _H  # 768
_N_FRAMES = 4


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def _avi_header_literal() -> bytes:
    """The constant RIFF/AVI prefix for the synthesized geometry: the
    'hdrl' LIST (avih + one 'vids'/'DIB ' stream) plus the 'movi' LIST
    header — everything before the first '00db' frame chunk. Built
    once at import; frame payloads are pure JVM concat after it."""
    avih = struct.pack(
        "<IIIIIIIIII4I",
        40_000,  # dwMicroSecPerFrame (25 fps)
        _FRAME_BYTES * 25,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no idx1 index is written, so no AVIF_HASINDEX)
        _N_FRAMES,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        _FRAME_BYTES,  # dwSuggestedBufferSize
        _W,
        _H,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # flags
            0,
            0,  # priority, language
            0,  # initial frames
            1,
            25,  # scale, rate (25 fps)
            0,  # start
            _N_FRAMES,  # length
            _FRAME_BYTES,  # suggested buffer
            0xFFFFFFFF,  # quality (default)
            _FRAME_BYTES,  # sample size
            0,  # rcFrame (left,top) packed — first half
        )
        + struct.pack("<HH", _W, _H)  # rcFrame (right, bottom)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        _W,
        _H,  # positive height = bottom-up rows (the BMP convention)
        1,
        24,  # planes, bit count
        0,  # BI_RGB uncompressed
        _FRAME_BYTES,
        0,
        0,
        0,
        0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    return hdrl


_HDRL = _avi_header_literal()
# movi LIST payload = 'movi' + N frame chunks of (8 + 768) bytes
_MOVI_SIZE = 4 + _N_FRAMES * (8 + _FRAME_BYTES)
_RIFF_SIZE = 4 + len(_HDRL) + 8 + _MOVI_SIZE  # 'AVI ' + hdrl + movi chunk
_AVI_PREFIX = (
    b"RIFF"
    + struct.pack("<I", _RIFF_SIZE)
    + b"AVI "
    + _HDRL
    + b"LIST"
    + struct.pack("<I", _MOVI_SIZE)
    + b"movi"
)
_FRAME_CHUNK_HDR = b"00db" + struct.pack("<I", _FRAME_BYTES)


def avi_from_text_col(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (media_id, content) where content is a VALID
    4-frame 16×16 uncompressed-DIB AVI whose frame pixels are the
    document's first 4·768 text bytes (space-padded) — pure JVM concat
    of binary literals and encoded text slices, zero Python.
    Near-identical documents therefore yield near-identical videos
    (the bmp_from_text_col / wav_from_text_col argument, one more
    container up)."""
    from data_lake_spark.operators.imagehash import ascii_text

    total = _N_FRAMES * _FRAME_BYTES
    padded = F.rpad(F.substring(ascii_text("text"), 1, total), total, " ")
    frames = []
    for i in range(_N_FRAMES):
        frames.append(F.lit(_FRAME_CHUNK_HDR))
        frames.append(
            F.encode(
                F.substring(padded, 1 + i * _FRAME_BYTES, _FRAME_BYTES),
                "UTF-8",
            )
        )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(_AVI_PREFIX), *frames).alias("content"),
    )


def avi_from_frame_text_cols(
    df: DataFrame, id_col: str, text_cols: list[str]
) -> DataFrame:
    """(id, text_0..text_3) → (media_id, content): a VALID AVI whose
    frame j's pixels are ``text_cols[j]``'s first 768 bytes
    (space-padded) — pure JVM concat like avi_from_text_col, but with
    per-frame control, so callers can synthesize videos that SHARE
    frames (sliding windows over a frame stream, recut clips)."""
    from data_lake_spark.operators.imagehash import ascii_text

    assert len(text_cols) == _N_FRAMES
    parts = [F.lit(_AVI_PREFIX)]
    for c in text_cols:
        parts.append(F.lit(_FRAME_CHUNK_HDR))
        parts.append(
            F.encode(
                F.rpad(
                    F.substring(ascii_text(F.col(c)), 1, _FRAME_BYTES),
                    _FRAME_BYTES,
                    " ",
                ),
                "UTF-8",
            )
        )
    return df.select(
        F.col(id_col).alias("media_id"), F.concat(*parts).alias("content")
    )


def _riff_children(buf: bytes, start: int, end: int):
    """Yield (chunk_id, payload_start, payload_size) walking a RIFF
    chunk list; LIST chunks yield their kind as id with the inner
    payload span so callers can recurse."""
    i = start
    while i + 8 <= end:
        cid = buf[i : i + 4]
        size = struct.unpack("<I", buf[i + 4 : i + 8])[0]
        if i + 8 + size > end:
            size = max(0, end - i - 8)  # truncated final chunk clamps
        yield cid, i + 8, size
        i += 8 + size + (size & 1)


def _riff_leaves(buf: bytes, start: int, end: int):
    """Yield every non-LIST (chunk_id, payload_start, payload_size) in
    the RIFF tree, depth-first, with an explicit stack — untrusted
    media can nest LISTs arbitrarily deep, so recursion would raise
    RecursionError on adversarial containers instead of degrading to
    a NULL fingerprint like other undecodable content."""
    stack = [_riff_children(buf, start, end)]
    while stack:
        item = next(stack[-1], None)
        if item is None:
            stack.pop()
            continue
        cid, off, size = item
        if cid == b"LIST":
            stack.append(_riff_children(buf, off + 4, off + size))
        else:
            yield cid, off, size


def avi_frames(content: bytes) -> Optional[list[bytes]]:
    """REAL frame extraction: walk the RIFF/AVI tree, read the video
    stream's BITMAPINFOHEADER from 'strf', and return each
    uncompressed '00db' frame wrapped as a standalone BMP byte string
    (header + raw payload — DIB payloads ARE BMP pixel arrays).
    Returns None for non-AVI bytes or streams with no uncompressed
    video frames (e.g. '00dc' compressed chunks — no codec here)."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    strf: Optional[bytes] = None
    frames: list[bytes] = []

    for cid, off, size in _riff_leaves(content, 12, len(content)):
        if cid == b"strf" and strf is None:
            strf = content[off : off + size]
        elif cid[2:4] == b"db":  # '00db', '01db', … uncompressed DIB
            frames.append(content[off : off + size])
    if strf is None or len(strf) < 24 or not frames:
        return None
    w = struct.unpack("<i", strf[4:8])[0]
    h = struct.unpack("<i", strf[8:12])[0]
    bpp = struct.unpack("<H", strf[14:16])[0]
    comp = struct.unpack("<I", strf[16:20])[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    bmp_header = (
        b"BM"
        + struct.pack("<I", 54 + len(frames[0]))
        + b"\x00\x00\x00\x00"
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<i", w)
        + struct.pack("<i", h)
        + struct.pack("<H", 1)
        + struct.pack("<H", 24)
        + struct.pack("<I", 0)
        + struct.pack("<I", len(frames[0]))
        + b"\x00" * 16
    )
    return [bmp_header + f for f in frames]


def avi_info(content: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, n_frames) from a RIFF/AVI container — header
    metadata like image_dimensions/wav_info, no codec needed. Counts
    actual video frame chunks ('..db'/'..dc') rather than trusting the
    avih field (truncated files lie). None for non-AVI bytes."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    dims: Optional[tuple[int, int]] = None
    n = 0

    for cid, off, size in _riff_leaves(content, 12, len(content)):
        if cid == b"strf" and dims is None and size >= 12:
            w = struct.unpack("<i", content[off + 4 : off + 8])[0]
            h = struct.unpack("<i", content[off + 8 : off + 12])[0]
            dims = (int(w), abs(int(h)))
        elif cid[2:4] in (b"db", b"dc"):
            n += 1
    if dims is None:
        return None
    return dims[0], dims[1], n


def frame_hash_table(media: DataFrame) -> DataFrame:
    """(media_id, content) → (media_id, frame_idx, dhash): the one
    Python pass (Arrow batches) — real AVI frame extraction + the
    EXISTING image dHash kernel per frame. Undecodable content yields
    a single (media_id, NULL, NULL) row so downstream keeper logic
    still sees the video (the dhash_table contract, per-frame)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_lake_spark.operators.imagehash import (
            _signed64,
            dhash64_batch,
        )

        for pdf in it:
            # container walk per video (cheap), then ONE vectorized
            # dHash pass over every frame in the batch (guide §4.2 —
            # the per-frame scalar kernel was the hot loop here)
            mids, idxs, frames_all = [], [], []
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                frames = avi_frames(bytes(raw)) if raw is not None else None
                if not frames:
                    mids.append(mid)
                    idxs.append(None)
                    frames_all.append(None)
                    continue
                for i, fr in enumerate(frames):
                    mids.append(mid)
                    idxs.append(i)
                    frames_all.append(fr)
            hashes = _signed64(dhash64_batch(frames_all))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": pd.array(idxs, dtype="Int64"),
                    "dhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return media.mapInPandas(
        batches, schema="media_id long, frame_idx long, dhash long"
    )


def video_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """Frame-aligned near-duplicate video pairs. Candidates: banded
    inverted index keyed (frame_idx, band, band_val) — any one
    near-identical aligned frame surfaces the pair (exhaustive for a
    frame within Hamming ≤ n_bands−1 by pigeonhole). Refine: join the
    full frame-hash tables and keep pairs where EVERY aligned frame is
    within ``max_hamming`` and frame counts agree. Returns (media_a,
    media_b, n_frames, max_frame_hamming), media_a < media_b."""
    fh = (
        frame_hash_table(media)
        .filter(F.col("dhash").isNotNull())
        .localCheckpoint()  # the Arrow pass feeds several consumers
    )
    return video_pairs_from_hashes(
        fh, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket
    )


def video_pairs_from_hashes(
    fh: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """``video_pairs`` starting from an existing non-null frame-hash
    table (media_id, frame_idx, dhash) — the serving split: the Arrow
    decode pass runs once at ingest (or via artifacts.stored_artifact)
    and every pairs/keepers call after that is pure JVM banding +
    refine over the persisted hashes, zero decode stages in-plan. No
    checkpoint here: a parquet-backed input is already materialized
    and each consumer re-reads only the pruned columns."""
    assert 64 % n_bands == 0
    width = 64 // n_bands
    mask = (1 << width) - 1

    n_frames = fh.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    # band key carries the frame index: collisions are frame-ALIGNED
    # (imagehash.band_rows keyed one level down — same bit slicing)
    bands = fh.select(
        "media_id",
        "frame_idx",
        "dhash",
        F.explode(F.array(*[F.lit(b) for b in range(n_bands)])).alias(
            "band"
        ),
    ).withColumn(
        "band_val",
        F.expr(f"shiftrightunsigned(dhash, band * {width})").bitwiseAND(
            F.lit(mask)
        ),
    )
    sized = bands.join(
        bands.groupBy("frame_idx", "band", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= max_bucket)
        .select("frame_idx", "band", "band_val"),
        ["frame_idx", "band", "band_val"],
    )
    a = sized.select(
        "frame_idx",
        "band",
        "band_val",
        F.col("media_id").alias("media_a"),
    )
    b = sized.select(
        "frame_idx",
        "band",
        "band_val",
        F.col("media_id").alias("media_b"),
    )
    cand = (
        a.join(b, ["frame_idx", "band", "band_val"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b")
        .distinct()
    )
    fa = fh.select(
        F.col("media_id").alias("media_a"),
        "frame_idx",
        F.col("dhash").alias("ha"),
    )
    fb = fh.select(
        F.col("media_id").alias("media_b"),
        "frame_idx",
        F.col("dhash").alias("hb"),
    )
    per_frame = (
        cand.join(fa, "media_a")
        .join(fb, ["media_b", "frame_idx"])
        .withColumn(
            "fh", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        )
    )
    agg = per_frame.groupBy("media_a", "media_b").agg(
        F.count(F.lit(1)).alias("n_aligned"),
        F.max("fh").alias("max_frame_hamming"),
    )
    na = n_frames.select(
        F.col("media_id").alias("media_a"), F.col("n_frames").alias("nf_a")
    )
    nb = n_frames.select(
        F.col("media_id").alias("media_b"), F.col("n_frames").alias("nf_b")
    )
    return (
        agg.join(na, "media_a")
        .join(nb, "media_b")
        # every frame aligned on both sides, all within threshold
        .filter(
            (F.col("n_aligned") == F.col("nf_a"))
            & (F.col("n_aligned") == F.col("nf_b"))
            & (F.col("max_frame_hamming") <= max_hamming)
        )
        .select(
            "media_a",
            "media_b",
            F.col("n_aligned").alias("n_frames"),
            "max_frame_hamming",
        )
    )


def video_clip_spans(
    media: DataFrame,
    min_frames: int = 2,
    ignore_hashes: tuple = (0,),
) -> DataFrame:
    """CLIP detection: contiguous frame runs shared across videos at
    ANY offset — ExactSubstr dedup (Lee et al. 2021, the
    operators/textdedup machinery) applied to frame-hash token
    sequences instead of word tokens. Each video renders as a
    'document' whose tokens are its frame dHashes in frame order; the
    existing gram-index + extend-and-merge pipeline then reports every
    non-canonical occurrence of a shared run — one dedup family across
    text and video, literally the same operator.

    Tokens are EXACT frame hashes: this finds re-used/recut clips
    (same source frames), not near-duplicate frames — for tolerance,
    quantize the hashes upstream (e.g. band values as tokens).
    Frame-ALIGNED whole-video near-dup is :func:`video_pairs`.

    ``ignore_hashes`` remaps boilerplate frame hashes — by default 0,
    the hash every UNIFORM frame (blank/padding/black) collapses to —
    onto per-occurrence unique tokens, so padding frames can never
    fabricate a cross-video clip (the hot-bucket cap's moral
    equivalent in the gram domain; without it, every short video
    sharing trailing blank frames reports a bogus span).

    Returns (media_id, span_start, span_frames): removable clip
    occurrences, offsets in frames. Scale shape is exact_substr_spans'
    (narrow per-video gram window, one gram-key aggregate, islands) on
    a corpus whose 'documents' are frames-per-video tokens long."""
    from data_lake_spark.operators.textdedup import exact_substr_spans

    docs = frame_token_docs(media, ignore_hashes)
    k = min(2, min_frames)
    return exact_substr_spans(docs, k=k, min_tokens=min_frames).select(
        F.col("doc_id").alias("media_id"),
        "span_start",
        F.col("span_tokens").alias("span_frames"),
    )


def frame_token_docs(
    media: DataFrame, ignore_hashes: tuple = (0,)
) -> DataFrame:
    """Render each video as a (doc_id, text) 'document' whose tokens
    are its frame dHashes in frame order — the adapter that lets the
    ENTIRE text-dedup operator family (ExactSubstr spans, the gram
    index, its streaming ingest) run on video unchanged. Hashes in
    ``ignore_hashes`` (uniform/blank frames) become per-occurrence
    unique tokens so padding can never fabricate cross-video matches."""
    fh = frame_hash_table(media).filter(F.col("dhash").isNotNull())
    ign = F.array(*[F.lit(int(h)).cast("long") for h in ignore_hashes])
    return (
        fh.groupBy("media_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("frame_idx", "dhash"))
            ).alias("fr")
        )
        .select(
            F.col("media_id").alias("doc_id"),
            F.array_join(
                F.transform(
                    "fr",
                    lambda s: F.when(
                        F.array_contains(ign, s["dhash"]),
                        F.concat(
                            F.lit("u"),
                            F.col("media_id").cast("string"),
                            F.lit("x"),
                            s["frame_idx"].cast("string"),
                        ),
                    ).otherwise(s["dhash"].cast("string")),
                ),
                " ",
            ).alias("text"),
        )
    )


def dedup_videos(
    media: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """The whole perceptual video-dedup pipeline as one call — the
    dedup_images / dedup_audio shape on the video column: per-frame
    dHash (one Arrow decode pass) → frame-aligned banded candidates →
    connected components → keep the min-id video per duplicate family.
    Returns (media_id, keeper, is_dup); undecodable videos survive as
    their own keepers."""
    pairs = video_pairs(
        media, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket
    )
    nodes = media.select(F.col("media_id").alias("node"))
    return keepers_from_pairs(nodes, pairs)


def keepers_from_pairs(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """Connected components over verified pairs → (media_id, keeper,
    is_dup) — the decision tail shared by the decode path
    (dedup_videos) and the stored-hash serving path."""
    from data_lake_spark.operators.graph import connected_components

    clusters = connected_components(
        nodes, pairs, src_col="media_a", dst_col="media_b"
    )
    return clusters.select(
        F.col("node").alias("media_id"),
        F.col("cluster_id").alias("keeper"),
        (F.col("node") != F.col("cluster_id")).alias("is_dup"),
    )
