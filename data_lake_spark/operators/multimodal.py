"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Beyond the reference surface (BASELINE.json north_star): a 100 TB training
pipeline carries media as ``binary`` columns with metadata structs, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages.

Decode tiers (``decode_media``):

- ``fake=True`` — deterministic digest-derived stand-in, for plumbing
  tests and CI determinism.
- ``fake=False`` (real): IMAGE dimensions come from PIL when importable,
  else from a dependency-free header parser (PNG/GIF/BMP/JPEG — the
  dimensions live in the container headers, no codec needed); WAV
  audio shape comes from the RIFF header (wav_info) and AVI video
  shape from the RIFF/AVI header (videofp.avi_info); the feature
  vector is a real 16-bin byte histogram. COMPRESSED audio/video still
  raise ``NotImplementedError`` — no ffmpeg/torchaudio in this
  container, and pretending otherwise would be dishonest. Swapping in
  the full codecs changes only the kernel body; schema, batching, and
  partitioning stay identical.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional codec: use the real thing when present
    from PIL import Image as _PILImage  # type: ignore
except Exception:  # pragma: no cover - PIL absent in this container
    _PILImage = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int, embedding array<float>"
)

_EMB_DIM = 16


def _fake_decode(content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a codec: dimensions and a feature vector
    derived from a content digest. REPLACE with PIL/ffmpeg kernels where
    those libraries exist; signatures and schemas stay identical."""
    digest = hashlib.sha256(content).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 + digest[2] % 16
    emb = [((b / 255.0) * 2 - 1) for b in digest[:_EMB_DIM]]
    return width, height, n_frames, emb


def image_dimensions(content: bytes) -> Optional[tuple[int, int]]:
    """(width, height) from the container header of a PNG/GIF/BMP/JPEG
    byte string, no codec library required — dimensions are header
    metadata, not pixel data. Returns None for unrecognized content."""
    if len(content) >= 24 and content[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", content[16:24])
        return int(w), int(h)
    if len(content) >= 10 and content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return int(w), int(h)
    if len(content) >= 26 and content[:2] == b"BM":
        w, h = struct.unpack("<ii", content[18:26])
        return int(w), abs(int(h))  # negative height = top-down DIB
    if len(content) >= 4 and content[:2] == b"\xff\xd8":  # JPEG: walk markers
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                return None
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seg_len
    return None


def _real_decode_image(content: bytes) -> tuple[int, int]:
    """True image dimensions: PIL when importable, else the header
    parser. Raises ValueError for bytes neither path can identify."""
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(content)) as im:
            return int(im.width), int(im.height)
    dims = image_dimensions(content)
    if dims is None:
        raise ValueError("unrecognized image content (no codec available)")
    return dims


def wav_info(content: bytes) -> Optional[tuple[int, int, int]]:
    """(sample_rate, n_channels, n_samples) from a RIFF/WAVE container,
    no codec library required — like image dimensions, PCM audio shape
    is header metadata. Walks the chunk list ('fmt ' for the format,
    'data' for the payload size). Returns None for non-WAV bytes."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    rate = channels = bits = data_size = None
    i = 12
    while i + 8 <= len(content):
        cid = content[i : i + 4]
        size = struct.unpack("<I", content[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(content):
            channels = struct.unpack("<H", content[i + 10 : i + 12])[0]
            rate = struct.unpack("<I", content[i + 12 : i + 16])[0]
            bits = struct.unpack("<H", content[i + 22 : i + 24])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate and channels and bits and data_size is not None:
        return int(rate), int(channels), int(data_size // (channels * (bits // 8)))
    return None


def _byte_histogram(content: bytes) -> list[float]:
    """Real (if simple) content feature: 16-bin byte-value histogram,
    normalized — deterministic, codec-free, and actually describes the
    bytes (unlike the digest fake)."""
    counts = [0] * _EMB_DIM
    for b in content:
        counts[b >> 4] += 1
    n = max(1, len(content))
    return [c / n for c in counts]


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract stage over Arrow batches (mapInPandas —
    one Python worker per partition, vectorized transfer; at scale,
    repartition upstream so batches are ~workable-MB-sized, and the decode
    cost parallelizes across executors).

    ``fake=False`` decodes real image dimensions (PIL or the header
    parser), real (sample_rate, channels) from the RIFF header for WAV
    audio — reported as (width, height) — and real (width, height,
    n_frames) from the RIFF header for AVI video
    (operators/videofp.avi_info), each with a byte-histogram feature.
    Non-AVI video and non-WAV audio raise NotImplementedError (no
    ffmpeg/torchaudio here). ``fake=True`` keeps the deterministic
    digest stub for all kinds."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_lake_spark.operators.videofp import avi_info

        for pdf in it:
            rows = []
            for mid, kind, raw in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                content = bytes(raw)
                if fake:
                    w, h, nf, emb = _fake_decode(content)
                elif kind == "image":
                    w, h = _real_decode_image(content)
                    nf, emb = 1, _byte_histogram(content)
                elif kind == "audio" and (wav := wav_info(content)) is not None:
                    # (width, height) carries (sample_rate, channels)
                    w, h = wav[0], wav[1]
                    nf, emb = 1, _byte_histogram(content)
                elif kind == "video" and (avi := avi_info(content)) is not None:
                    w, h, nf = avi
                    emb = _byte_histogram(content)
                else:
                    raise NotImplementedError(
                        "compressed audio/video codecs (ffmpeg/torchaudio) "
                        "are not available in this environment; images, WAV "
                        "audio, and uncompressed-DIB AVI video decode for "
                        "real, other kinds need fake=True"
                    )
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(content),
                        "sha256": hashlib.sha256(content).hexdigest(),
                        "width": w,
                        "height": h,
                        "n_frames": nf if kind == "video" else 1,
                        "embedding": emb,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices 0..n_frames-1
    and keep every Nth — pure built-ins (sequence + explode), no UDF; the
    decode stub stands in for the actual frame grab."""
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1)
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_n == 0)
    )


RESIZED_SCHEMA = (
    "media_id long, src_width int, src_height int, width int, height int, "
    "resized_sha string"
)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize stage for image media — the third mapInPandas verb
    (decode / feature-extract / RESIZE / frame-sample). With PIL
    importable and ``fake=False`` this truly resizes and digests the
    resized PNG; without PIL the real path raises (a resize needs pixel
    access, unlike dimension decoding) and ``fake=True`` substitutes a
    deterministic digest of (content, target dims) so idempotence and
    plumbing stay testable. Schema, batching, and partition behavior are
    identical in every mode."""
    if not fake and _PILImage is None:
        raise NotImplementedError(
            "image resize needs a codec (PIL) which is not available in "
            "this environment; call with fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                content = bytes(raw)
                if fake:
                    w0, h0, _, _ = _fake_decode(content)
                    tag = content + f"|{width}x{height}".encode()
                    sha = hashlib.sha256(tag).hexdigest()
                else:  # pragma: no cover - PIL absent in this container
                    import io

                    with _PILImage.open(io.BytesIO(content)) as im:
                        w0, h0 = int(im.width), int(im.height)
                        buf = io.BytesIO()
                        im.resize((width, height)).save(buf, format="PNG")
                    sha = hashlib.sha256(buf.getvalue()).hexdigest()
                rows.append(
                    {
                        "media_id": mid,
                        "src_width": w0,
                        "src_height": h0,
                        "width": width,
                        "height": height,
                        "resized_sha": sha,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def read_media_dir(spark, path: str, kind: str = "image") -> DataFrame:
    """Media ingestion from a directory of raw files via Spark's native
    ``binaryFile`` source — the real on-ramp for image/audio/video blobs
    (reads are distributed and columnar-metadata'd: path, mtime, length,
    content). Output conforms to MEDIA_SCHEMA; media_id is a stable hash
    of the file path (no driver-side enumeration)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col("length").cast("long").alias("n_bytes"),
            F.col("path").alias("source_uri"),
        ).alias("meta"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests: treat document text bytes as opaque media
    content so the multimodal plumbing runs against real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
        .alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("source_uri"),
        ).alias("meta"),
    )
