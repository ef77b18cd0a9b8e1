"""Property-based checks (hypothesis) for the image-dedup kernel: the
numpy dHash path is bit-identical to an independent scalar reference on
arbitrary BMPs (any geometry, row order, stride padding), decode is an
exact pixel round-trip, and Hamming banding never misses a pair within
its guarantee radius. Pure-Python properties — no Spark session, so
hypothesis can afford real example counts here."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from data_lake_spark.operators.imagehash import (
    _decode_bmp_pixels,
    dhash64,
)


def _bmp(pixels_topdown, top_down=False):
    h = len(pixels_topdown)
    w = len(pixels_topdown[0])
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    rows = pixels_topdown if top_down else list(reversed(pixels_topdown))
    body = b"".join(
        b"".join(bytes(p) for p in row) + b"\xaa" * pad for row in rows
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


def _dhash_reference(px):
    """Independent scalar reformulation of the dHash spec (top-down
    pixel rows of (b, g, r)) — guards the production numpy kernel."""
    h, w = len(px), len(px[0])
    gray = [
        [(299 * p[2] + 587 * p[1] + 114 * p[0]) // 1000 for p in row]
        for row in px
    ]
    bits = 0
    for r in range(8):
        r0, r1 = (r * h) // 8, max(((r + 1) * h) // 8, (r * h) // 8 + 1)
        cells = []
        for c in range(9):
            c0 = (c * w) // 9
            c1 = max(((c + 1) * w) // 9, c0 + 1)
            s = sum(gray[i][j] for i in range(r0, r1) for j in range(c0, c1))
            cells.append(s // ((r1 - r0) * (c1 - c0)))
        for c in range(8):
            if cells[c] > cells[c + 1]:
                bits |= 1 << (r * 8 + c)
    return bits


_PIXELS = st.integers(min_value=0, max_value=255)


@st.composite
def _images(draw):
    w = draw(st.integers(min_value=1, max_value=24))
    h = draw(st.integers(min_value=1, max_value=24))
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    px = [
        [
            (
                (seed + 7 * r + 13 * c) % 256,
                (seed // 3 + 11 * r + 5 * c) % 256,
                (seed // 7 + 3 * r + 17 * c) % 256,
            )
            for c in range(w)
        ]
        for r in range(h)
    ]
    # sprinkle a few fully-random pixels so images aren't all affine
    for _ in range(draw(st.integers(min_value=0, max_value=4))):
        r = draw(st.integers(min_value=0, max_value=h - 1))
        c = draw(st.integers(min_value=0, max_value=w - 1))
        px[r][c] = (draw(_PIXELS), draw(_PIXELS), draw(_PIXELS))
    return px


@settings(max_examples=60, deadline=None)
@given(_images(), st.booleans())
def test_numpy_dhash_matches_scalar_reference(px, top_down):
    content = _bmp(px, top_down=top_down)
    assert dhash64(content) == _dhash_reference(px)


@settings(max_examples=40, deadline=None)
@given(_images(), st.booleans())
def test_decode_round_trips_pixels_any_geometry(px, top_down):
    dec = _decode_bmp_pixels(_bmp(px, top_down=top_down))
    assert dec == [[tuple(p) for p in row] for row in px]


@settings(max_examples=40, deadline=None)
@given(_images())
def test_row_order_is_invisible_to_the_hash(px):
    assert dhash64(_bmp(px)) == dhash64(_bmp(px, top_down=True))


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=7),
)
def test_banding_guarantee_within_radius(base, flips):
    # 8 bands × 8 bits: any two hashes within Hamming ≤ 7 share at
    # least one full band (pigeonhole) — the exhaustiveness claim the
    # query's candidate join rests on
    other = base
    for b in flips:
        other ^= 1 << b
    bands_a = [(base >> (8 * i)) & 0xFF for i in range(8)]
    bands_b = [(other >> (8 * i)) & 0xFF for i in range(8)]
    assert any(a == b for a, b in zip(bands_a, bands_b))
