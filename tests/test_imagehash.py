"""Perceptual image dedup kernel contracts (operators/imagehash.py):
hand-checkable dHash values, BMP format edges (bottom-up/top-down rows,
stride padding), planted near-dup recall / distinct-pair rejection, the
synthesized-BMP adapter, and the hot-bucket cap."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from data_lake_spark.operators.imagehash import (
    _decode_bmp_pixels,
    bmp_from_text_col,
    dhash64,
    dhash_table,
    hamming_pairs,
)


def _bmp(pixels_topdown, top_down=False):
    """Build a 24-bit BMP from a top-down pixel matrix of (b, g, r)."""
    h = len(pixels_topdown)
    w = len(pixels_topdown[0])
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    rows = pixels_topdown if top_down else list(reversed(pixels_topdown))
    body = b"".join(
        b"".join(bytes(p) for p in row) + b"\x00" * pad for row in rows
    )
    header = (
        b"BM"
        + struct.pack("<I", 54 + len(body))
        + b"\x00\x00\x00\x00"
        + struct.pack("<I", 54)
        + struct.pack("<I", 40)
        + struct.pack("<i", w)
        + struct.pack("<i", -h if top_down else h)
        + struct.pack("<H", 1)
        + struct.pack("<H", 24)
        + struct.pack("<I", 0)
        + struct.pack("<I", len(body))
        + b"\x00" * 16
    )
    return header + body


def _flat(v, w=16, h=16):
    return [[(v, v, v)] * w for _ in range(h)]


def test_dhash_monotone_gradients_are_all_zero_and_all_one():
    # brightness strictly increasing left-to-right: every cell[r][c] <
    # cell[r][c+1], so every gradient bit is 0
    inc = [[(c * 15, c * 15, c * 15) for c in range(16)] for _ in range(16)]
    assert dhash64(_bmp(inc)) == 0
    # strictly decreasing: every bit set
    dec = [[((15 - c) * 15,) * 3 for c in range(16)] for _ in range(16)]
    assert dhash64(_bmp(dec)) == (1 << 64) - 1


def test_decode_row_order_and_stride_padding():
    # the same logical image must decode (and hash) identically whether
    # rows are stored bottom-up (positive height) or top-down (negative)
    px = [
        [((r * 16 + c) % 256,) * 3 for c in range(16)] for r in range(16)
    ]
    assert _decode_bmp_pixels(_bmp(px)) == _decode_bmp_pixels(
        _bmp(px, top_down=True)
    )
    assert dhash64(_bmp(px)) == dhash64(_bmp(px, top_down=True))
    # width 10 → 30-byte rows padded to 32: padding must be skipped
    narrow = [[(c * 25,) * 3 for c in range(10)] for _ in range(10)]
    dec = _decode_bmp_pixels(_bmp(narrow))
    assert dec is not None and len(dec[0]) == 10
    assert dec[0][3] == (75, 75, 75)


def test_dhash_rejects_non_bmp_content():
    assert dhash64(b"not an image at all") is None
    assert dhash64(b"BM" + b"\x00" * 20) is None  # truncated header
    # 8bpp (paletted) BMPs are not the uncompressed-24bpp fast path
    bad = bytearray(_bmp(_flat(7)))
    bad[28:30] = struct.pack("<H", 8)
    assert dhash64(bytes(bad)) is None


def test_near_dup_small_hamming_distinct_large():
    base = [[((r * 7 + c * 13) % 200,) * 3 for c in range(16)] for r in range(16)]
    # near dup: brighten one pixel slightly
    near = [row[:] for row in base]
    near[5][5] = (min(255, base[5][5][0] + 40),) * 3
    # distinct: transposed-phase pattern
    other = [[((r * 13 + c * 7 + 90) % 200,) * 3 for c in range(16)] for r in range(16)]
    hb, hn, ho = dhash64(_bmp(base)), dhash64(_bmp(near)), dhash64(_bmp(other))
    assert bin(hb ^ hn).count("1") <= 4
    assert bin(hb ^ ho).count("1") > 6


def test_pipeline_finds_planted_pairs_only(spark):
    base = [[((r * 7 + c * 13) % 200,) * 3 for c in range(16)] for r in range(16)]
    near = [row[:] for row in base]
    near[5][5] = (min(255, base[5][5][0] + 40),) * 3
    other = [[((r * 13 + c * 7 + 90) % 200,) * 3 for c in range(16)] for r in range(16)]
    media = spark.createDataFrame(
        [
            (1, _bmp(base)),
            (2, _bmp(base)),  # exact dup of 1
            (3, _bmp(near)),  # near dup of 1
            (4, _bmp(other)),  # unrelated
            (5, b"garbage bytes"),  # undecodable → NULL hash, excluded
        ],
        "media_id long, content binary",
    )
    hashes = dhash_table(media)
    assert hashes.filter(F.col("dhash").isNull()).count() == 1
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in hamming_pairs(hashes, max_hamming=6).collect()
    }
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= 4
    assert not any(4 in p or 5 in p for p in got)


def test_bmp_from_text_col_round_trips_text_bytes(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "x" * 900)], "doc_id long, text string"
    )
    out = {r["media_id"]: bytes(r["content"]) for r in bmp_from_text_col(docs).collect()}
    for mid, content in out.items():
        px = _decode_bmp_pixels(content)
        assert px is not None and len(px) == 16 and len(px[0]) == 16
    # doc 1 is short → padded with spaces. The decoder returns rows
    # top-down while the BMP stores them bottom-up, so file order (the
    # text bytes) is the decoded matrix reversed row-wise
    px1 = _decode_bmp_pixels(out[1])
    flat = [b for row in reversed(px1) for p in row for b in p]
    assert bytes(flat[:16]) == b"alpha beta gamma"
    assert flat[16] == ord(" ")  # padding
    # doc 2 is long → truncated to 768 text bytes
    assert len(out[2]) == 54 + 768


def test_identical_texts_collide_at_hamming_zero(spark):
    docs = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here"), (3, "different words")],
        "doc_id long, text string",
    )
    pairs = hamming_pairs(
        dhash_table(bmp_from_text_col(docs)), max_hamming=0
    ).collect()
    assert [(r["media_a"], r["media_b"], r["hamming"]) for r in pairs] == [
        (1, 2, 0)
    ]


def test_hot_bucket_cap_drops_pathological_buckets(spark):
    # 10 identical blank images: every band bucket holds 10 > max_bucket,
    # so the cap suppresses all pairs (production routes these to the
    # exact-hash dedup path instead of paying O(n²) here)
    blank = _bmp(_flat(128))
    media = spark.createDataFrame(
        [(i, blank) for i in range(10)], "media_id long, content binary"
    )
    hashes = dhash_table(media)
    assert hamming_pairs(hashes, max_bucket=5).count() == 0
    assert hamming_pairs(hashes, max_bucket=64).count() == 45


def test_dedup_images_keeper_assignment_and_idempotence(spark):
    base = [[((r * 7 + c * 13) % 200,) * 3 for c in range(16)] for r in range(16)]
    near = [row[:] for row in base]
    near[5][5] = (min(255, base[5][5][0] + 40),) * 3
    other = [[((r * 13 + c * 7 + 90) % 200,) * 3 for c in range(16)] for r in range(16)]
    media = spark.createDataFrame(
        [
            (1, _bmp(base)),
            (2, _bmp(base)),   # exact dup → family of 1
            (3, _bmp(near)),   # near dup → same family via 1
            (4, _bmp(other)),  # own keeper
            (5, b"undecodable"),  # NULL hash → survives as own keeper
        ],
        "media_id long, content binary",
    )
    from data_lake_spark.operators.imagehash import dedup_images

    labels = {r["media_id"]: (r["keeper"], r["is_dup"]) for r in dedup_images(media).collect()}
    assert labels == {
        1: (1, False),
        2: (1, True),
        3: (1, True),
        4: (4, False),
        5: (5, False),
    }
    # idempotent: the kept set has no families left
    kept = media.join(
        dedup_images(media).filter("NOT is_dup").select("media_id"),
        "media_id",
        "left_semi",
    )
    relabel = dedup_images(kept).collect()
    assert all(not r["is_dup"] for r in relabel)


def test_dhash64_batch_bit_identical_to_scalar_kernel():
    """r11: the vectorized batch kernel must agree with the scalar
    reference on EVERY input — synthesized geometry, odd widths with
    stride padding, top-down rows, truncated/garbage bytes, Nones —
    including mixed-geometry batches (one numpy pass per group)."""
    import random

    from data_lake_spark.operators.imagehash import dhash64, dhash64_batch

    rng = random.Random(11)

    def bmp(w, h, top_down=False):
        stride = (w * 3 + 3) & ~3
        ah = abs(h)
        data = bytes(rng.randrange(256) for _ in range(stride * ah))
        hdr = (
            b"BM"
            + struct.pack("<I", 54 + len(data))
            + b"\x00" * 4
            + struct.pack("<I", 54)
            + struct.pack("<I", 40)
            + struct.pack("<i", w)
            + struct.pack("<i", -ah if top_down else ah)
            + struct.pack("<H", 1)
            + struct.pack("<H", 24)
            + struct.pack("<I", 0)
            + struct.pack("<I", len(data))
            + b"\x00" * 16
        )
        return hdr + data

    cases = []
    for w, h, td in [
        (16, 16, False), (16, 16, True), (7, 5, False), (7, 5, True),
        (9, 16, False), (33, 12, True), (1, 1, False), (8, 3, False),
    ]:
        cases.extend(bmp(w, h, td) for _ in range(4))
    cases += [None, b"junk", b"BM" + b"\x00" * 40, bmp(16, 16)[:100]]
    rng.shuffle(cases)
    got = dhash64_batch(cases)
    want = [dhash64(bytes(c)) if c is not None else None for c in cases]
    assert got == want
