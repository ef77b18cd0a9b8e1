"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Beyond the reference surface (BASELINE.json north_star): a 100 TB training
pipeline carries media as ``binary`` columns with metadata structs, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages. The image/audio codec libraries are NOT in this
container, so the decode kernels are STUBS — ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake (derived from the bytes) so the Spark-side plumbing —
schema, batch iteration, partitioning, UDF signatures — is real and
testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract stage over Arrow batches (mapInPandas —
    one Python worker per partition, vectorized transfer; at scale,
    repartition upstream so batches are ~workable-MB-sized, and the decode
    cost parallelizes across executors)."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/torchaudio/ffmpeg) are not available in this "
            "environment; call with fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, raw in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                content = bytes(raw)
                w, h, nf, emb = _fake_decode(content)
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
    (decode / feature-extract / RESIZE / frame-sample). The kernel is a
    stub (no PIL here): the 'resized' artifact is a deterministic digest
    of (content, target dims), so idempotence and plumbing are testable;
    swap the body for PIL's resize where available — schema, batching,
    and partition behavior do not change."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "call with fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                content = bytes(raw)
                w0, h0, _, _ = _fake_decode(content)
                tag = content + f"|{width}x{height}".encode()
                rows.append(
                    {
                        "media_id": mid,
                        "src_width": w0,
                        "src_height": h0,
                        "width": width,
                        "height": height,
                        "resized_sha": hashlib.sha256(tag).hexdigest(),
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
