"""Perceptual image dedup: dHash over decoded pixels + Hamming-banded
candidate pairs.

Extends the dedup family (operators/textdedup.py) to the multimodal
binary column. The pipeline is the near-dup shape used everywhere else
in this repo:

1. decode + hash each image ONCE (Arrow ``mapInPandas`` — the sanctioned
   Python stage for codec work, same tier as operators/multimodal.py;
   per-image cost parallelizes across executors, nothing pairwise);
2. band the 64-bit hash into 8×8-bit keys and equi-join the banded
   inverted index (pure JVM) — candidates come from hash-bucket
   collisions, NEVER an all-pairs cross join;
3. refine candidates with the exact Hamming distance via
   ``bit_count(a XOR b)`` (one JVM intrinsic per pair).

Recall guarantee: two hashes within Hamming distance d < n_bands differ
in at most d bands, so by pigeonhole at least one band matches exactly —
8 bands make the band-join EXHAUSTIVE for d ≤ 7 (we default the refine
threshold to 6). This is deterministic banding, not probabilistic
MinHash banding.

The decode is REAL: a dependency-free 24-bit-uncompressed-BMP pixel
reader (BMP pixel data is raw BGR — no codec needed, unlike PNG/JPEG),
integer Rec.601 grayscale, integer area-average downsample to 9×8, and
the standard row-wise gradient bits. Swapping PIL/ffmpeg in for other
formats changes only ``_decode_bmp_pixels``; hashing, banding, and the
join topology are format-agnostic. No PIL exists in this container
(operators/multimodal.py gates it), so BMP — honestly decodable from
bytes alone — is the working real-decode format, and
:func:`bmp_from_text_col` synthesizes valid BMPs from document text as
pure JVM byte concatenation for corpus-scale runs against testdata.

100 TB: step 1 is one scan (Python touches each image exactly once);
step 2 shuffles 8 small rows per image keyed by (band, value) — band
buckets shard uniformly because dHash bits are near-iid; step 3 is
per-candidate-pair constant work. Hot buckets (e.g. monochrome images
all hashing to 0) are the textdedup hot-band problem — cap or split
oversized buckets before pairing (``max_bucket`` arg).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: synthesized image geometry: 16×16 RGB24 ⇒ 48-byte rows, no padding
#: (BMP rows pad to 4 bytes; 16·3 = 48 is already aligned)
_W = 16
_H = 16
_ROW = _W * 3
_PIXELS = _ROW * _H  # 768
_HEADER = (
    b"BM"
    + struct.pack("<I", 54 + _PIXELS)  # file size
    + b"\x00\x00\x00\x00"
    + struct.pack("<I", 54)  # pixel-array offset
    + struct.pack("<I", 40)  # BITMAPINFOHEADER size
    + struct.pack("<i", _W)
    + struct.pack("<i", _H)  # positive height = bottom-up rows
    + struct.pack("<H", 1)  # planes
    + struct.pack("<H", 24)  # bits per pixel
    + struct.pack("<I", 0)  # BI_RGB, uncompressed
    + struct.pack("<I", _PIXELS)
    + b"\x00" * 16  # ppm + palette fields, unused
)


def ascii_text(col) -> "F.Column":
    """Delete non-ASCII codepoints from a text column before the
    media-synthesis substring/encode, so declared RIFF/BMP chunk sizes
    always equal the emitted byte count (round-8 advice: char-based
    substring + UTF-8 encode misframed chunks on non-ASCII corpora).

    DELETION (empty replacement) is the one normalization that agrees
    across engines: Spark's Java regex sees an astral codepoint as two
    surrogates and removes both; DuckDB's RE2 removes the single
    codepoint — identical results. Replacing with a placeholder char
    would emit '??' vs '?' and shift every later position. The DuckDB
    oracles mirror this with regexp_replace(text, '[^\\x00-\\x7f]',
    '', 'g')."""
    return F.regexp_replace(col, "[^\\x00-\\x7f]", "")


def bmp_from_text_col(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (media_id, content) where content is a VALID
    16×16 24-bit BMP whose pixel bytes are the document's first 768
    text bytes (ASCII-normalized, space-padded) — pure JVM concat of a
    binary literal and encoded text, zero Python. Near-identical
    documents therefore yield near-identical images: the honest way to
    get a dedup-shaped image corpus out of text-only testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.lit(_HEADER),
            F.encode(
                F.rpad(F.substring(ascii_text("text"), 1, _PIXELS), _PIXELS, " "),
                "UTF-8",
            ),
        ).alias("content"),
    )


def _decode_bmp_pixels(content: bytes) -> Optional[list[list[tuple[int, int, int]]]]:
    """Raw pixel matrix (top-down rows of (b, g, r)) from an
    uncompressed 24-bit BMP, or None if the bytes are anything else.
    Handles bottom-up and top-down row order and 4-byte row padding —
    i.e. any BI_RGB 24bpp BMP, not just the synthesized shape."""
    if len(content) < 54 or content[:2] != b"BM":
        return None
    offset = struct.unpack("<I", content[10:14])[0]
    w = struct.unpack("<i", content[18:22])[0]
    h = struct.unpack("<i", content[22:26])[0]
    bpp = struct.unpack("<H", content[28:30])[0]
    comp = struct.unpack("<I", content[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(content) < offset + stride * h:
        return None
    rows = []
    for r in range(h):
        src = r if top_down else h - 1 - r
        base = offset + src * stride
        row = [
            (
                content[base + 3 * c],
                content[base + 3 * c + 1],
                content[base + 3 * c + 2],
            )
            for c in range(w)
        ]
        rows.append(row)
    return rows


def _decode_bmp_np(content: bytes):
    """numpy twin of :func:`_decode_bmp_pixels`: (h, w, 3) uint8 BGR in
    top-down row order, or None. Same header checks; the pixel copy is
    one frombuffer + reshape instead of a Python loop (the hash kernel
    runs per image inside the Arrow batch stage — this is its hot
    path)."""
    import numpy as np

    if len(content) < 54 or content[:2] != b"BM":
        return None
    offset = struct.unpack("<I", content[10:14])[0]
    w = struct.unpack("<i", content[18:22])[0]
    h = struct.unpack("<i", content[22:26])[0]
    bpp = struct.unpack("<H", content[28:30])[0]
    comp = struct.unpack("<I", content[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(content) < offset + stride * h:
        return None
    arr = (
        np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=offset)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    return arr if top_down else arr[::-1]


def dhash64(content: bytes) -> Optional[int]:
    """64-bit difference hash: decode, integer Rec.601 grayscale,
    integer area-average downsample to 9×8, then bit k = (row r,
    col c) set iff cell[r][c] > cell[r][c+1]. All-INTEGER arithmetic
    (numpy int64) — deterministic across platforms, no float rounding
    anywhere; bit-identical to the scalar reference formulation the
    tests hand-check."""
    import numpy as np

    px = _decode_bmp_np(content)
    if px is None:
        return None
    h, w = px.shape[0], px.shape[1]
    g = px.astype(np.int64)
    gray = (299 * g[:, :, 2] + 587 * g[:, :, 1] + 114 * g[:, :, 0]) // 1000
    rb = [(r * h) // 8 for r in range(8)] + [h]
    cb = [(c * w) // 9 for c in range(9)] + [w]
    cells = np.empty((8, 9), dtype=np.int64)
    for r in range(8):
        r0, r1 = rb[r], max(rb[r + 1], rb[r] + 1)
        for c in range(9):
            c0, c1 = cb[c], max(cb[c + 1], cb[c] + 1)
            block = gray[r0:r1, c0:c1]
            cells[r, c] = int(block.sum()) // block.size
    bits = 0
    diff = cells[:, :8] > cells[:, 1:]
    for r in range(8):
        for c in range(8):
            if diff[r, c]:
                bits |= 1 << (r * 8 + c)
    return bits


def dhash64_batch(contents) -> list:
    """Batch twin of :func:`dhash64` (guide §4.2 — hand whole batches to
    vectorized numpy instead of 72 tiny per-image block ops): images are
    grouped by decoded geometry (offset, w, h, row order, stride), each
    group is stacked into ONE (n, h, w, 3) array, and grayscale / cell
    averaging / gradient bits run as ~80 vectorized ops per GROUP
    instead of per image. All arithmetic is the same int64 integer
    recipe, so results are bit-identical to the scalar kernel for every
    input (pinned by tests/test_imagehash.py); undecodable entries come
    back None. Input may be a list/Series of bytes-or-None; returns a
    list of unsigned ints-or-None in input order."""
    import numpy as np

    out: list = [None] * len(contents)
    groups: dict = {}
    for i, raw in enumerate(contents):
        if raw is None:
            continue
        c = bytes(raw)
        if len(c) < 54 or c[:2] != b"BM":
            continue
        offset = struct.unpack("<I", c[10:14])[0]
        w = struct.unpack("<i", c[18:22])[0]
        h = struct.unpack("<i", c[22:26])[0]
        bpp = struct.unpack("<H", c[28:30])[0]
        comp = struct.unpack("<I", c[30:34])[0]
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            continue
        top_down = h < 0
        ah = abs(h)
        stride = (w * 3 + 3) & ~3
        if len(c) < offset + stride * ah:
            continue
        groups.setdefault((offset, w, ah, top_down, stride), []).append(
            (i, c)
        )
    for (offset, w, ah, top_down, stride), items in groups.items():
        n = len(items)
        px = np.empty((n, ah, w, 3), dtype=np.uint8)
        for j, (_, c) in enumerate(items):
            arr = (
                np.frombuffer(c, np.uint8, count=stride * ah, offset=offset)
                .reshape(ah, stride)[:, : w * 3]
                .reshape(ah, w, 3)
            )
            px[j] = arr if top_down else arr[::-1]
        g = px.astype(np.int64)
        gray = (299 * g[:, :, :, 2] + 587 * g[:, :, :, 1] + 114 * g[:, :, :, 0]) // 1000
        rb = [(r * ah) // 8 for r in range(8)] + [ah]
        cb = [(c0 * w) // 9 for c0 in range(9)] + [w]
        cells = np.empty((n, 8, 9), dtype=np.int64)
        for r in range(8):
            r0, r1 = rb[r], max(rb[r + 1], rb[r] + 1)
            for c0 in range(9):
                c_lo, c_hi = cb[c0], max(cb[c0 + 1], cb[c0] + 1)
                block = gray[:, r0:r1, c_lo:c_hi]
                cells[:, r, c0] = block.sum(axis=(1, 2)) // (
                    (r1 - r0) * (c_hi - c_lo)
                )
        diff = cells[:, :, :8] > cells[:, :, 1:]
        # bit k = (r, c) at k = r*8 + c — identical weight layout to the
        # scalar kernel's `bits |= 1 << (r * 8 + c)`
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(
            8, 8
        )
        bits = (diff.astype(np.uint64) * weights).sum(
            axis=(1, 2), dtype=np.uint64
        )
        for (i, _), b in zip(items, bits):
            out[i] = int(b)
    return out


def _signed64(vals: list) -> list:
    """Two's-complement unsigned-int-or-None list into signed long range
    (bit 63 set ⇒ negative) — banding and XOR read raw bits either way."""
    return [
        v - (1 << 64) if v is not None and v >= 1 << 63 else v for v in vals
    ]


def dhash_table(media: DataFrame) -> DataFrame:
    """(media_id, content) → (media_id, dhash long): the one Python pass
    (Arrow batches); undecodable content yields a NULL hash rather than
    poisoning the batch. dHash's sign convention needs the result as a
    SIGNED 64-bit long — bit 63 set means negative, which is fine: both
    banding and XOR treat it as raw bits. Hashing itself runs through
    the vectorized batch kernel (one numpy pass per geometry group, not
    per image — guide §4.2; bit-identity to the scalar kernel is
    test-pinned)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = _signed64(dhash64_batch(pdf["content"]))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "dhash": pd.array(hashes, dtype="Int64")}
            )

    return media.mapInPandas(batches, schema="media_id long, dhash long")


def band_rows(hashes: DataFrame, n_bands: int = 8) -> DataFrame:
    """(media_id, dhash) → banded rows (media_id, dhash, band,
    band_val): the inverted-index key projection shared by the batch
    pair join (:func:`hamming_pairs`) and the streaming history screen
    (streaming.start_dhash_index_ingest). Map-only — banding the hash
    index is a projection of two-long rows, so deriving it at read
    time beats persisting an 8×-larger banded index."""
    assert 64 % n_bands == 0
    width = 64 // n_bands
    mask = (1 << width) - 1
    return hashes.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(*[F.lit(b) for b in range(n_bands)])
        ).alias("band"),
    ).withColumn(
        # shiftrightunsigned's numBits arg takes a Column only in SQL form
        "band_val",
        F.expr(f"shiftrightunsigned(dhash, band * {width})").bitwiseAND(
            F.lit(mask)
        ),
    )


def hamming_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    max_bucket: int = 64,
    hash_col: str = "dhash",
    checkpoint: bool = True,
) -> DataFrame:
    """Near-duplicate media pairs from a 64-bit hash frame: 8-bit band
    inverted index (8 bands over 64 bits ⇒ exhaustive for Hamming ≤ 7),
    distinct candidate pairs, exact ``bit_count(XOR)`` refine. Returns
    (media_a, media_b, hamming), media_a < media_b.

    Format-agnostic from the hash on: any 64-bit perceptual hash rides
    this — image dHash (the default ``hash_col``) or the audio envelope
    fingerprint (operators/audiofp.py, ``hash_col="afp"``).

    ``max_bucket`` drops pathological buckets (the textdedup hot-band
    cap): a band value shared by more than that many images — e.g.
    blank images — would quadratically blow the candidate set while
    contributing only already-connected dup families; production runs
    log what was dropped and route those to the exact-hash dedup path."""
    assert 64 % n_bands == 0
    if hash_col != "dhash":
        hashes = hashes.withColumnRenamed(hash_col, "dhash")
    # materialize once: the hash frame feeds three consumers (bucket
    # census + both join sides), and its upstream is the Arrow decode
    # pass — without the checkpoint the per-image Python work runs 3×
    # (the dedup_clusters localCheckpoint precedent). The frame is
    # (id, hash): two longs per image, tiny relative to the images.
    # Callers whose hash frame is ALREADY at rest (the *_pairs_stored
    # artifact readers) pass checkpoint=False: re-reading two pruned
    # parquet columns costs less than a materialization, and the plan
    # stays transparent for the zero-decode census tests.
    h = hashes.filter(F.col("dhash").isNotNull())
    if checkpoint:
        h = h.localCheckpoint()
    bands = band_rows(h, n_bands)
    # hot-bucket cap: count per (band, band_val), keep human-sized buckets
    sized = bands.join(
        bands.groupBy("band", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= max_bucket)
        .select("band", "band_val"),
        ["band", "band_val"],
    )
    a = sized.select(
        F.col("band"),
        F.col("band_val"),
        F.col("media_id").alias("media_a"),
        F.col("dhash").alias("ha"),
    )
    b = sized.select(
        F.col("band"),
        F.col("band_val"),
        F.col("media_id").alias("media_b"),
        F.col("dhash").alias("hb"),
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "ha", "hb")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
    )


def dedup_images(
    media: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """The whole perceptual image-dedup pipeline as one call — the
    textdedup.dedup_corpus shape applied to the binary column: dHash
    (one Arrow decode pass) → Hamming-banded candidate pairs →
    connected components → keep the min-id image per duplicate family.

    Returns every input image labeled: (media_id, keeper, is_dup) —
    is_dup means "drop me, keeper survives in my place". Undecodable
    images hash NULL, join nothing, and survive as their own keepers
    (route them to exact-byte dedup upstream). Idempotent: deduping
    the kept set again removes nothing — a family collapses to its
    keeper, and keepers share no sub-threshold pair by construction of
    the component labeling.

    100 TB shape: dHash/banding per the module docstring; the component
    step runs on the SPARSE verified pair set (operators/graph
    escalates from driver union-find to the distributed O(log n) star
    fixpoint on size), never on the image count."""
    from data_lake_spark.operators.graph import connected_components

    hashes = dhash_table(media)  # checkpointed inside hamming_pairs
    pairs = hamming_pairs(
        hashes, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket
    )
    nodes = media.select(F.col("media_id").alias("node"))
    clusters = connected_components(
        nodes, pairs, src_col="media_a", dst_col="media_b"
    )
    return clusters.select(
        F.col("node").alias("media_id"),
        F.col("cluster_id").alias("keeper"),
        (F.col("node") != F.col("cluster_id")).alias("is_dup"),
    )
