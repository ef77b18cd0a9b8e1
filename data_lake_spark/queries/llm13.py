"""Training-data-pipeline queries, part 13 (round 8): perceptual audio
dedup over the REAL WAV decode path, and perceptual video dedup over
REAL RIFF/AVI frame extraction.

Beyond the reference surface (BASELINE.json north_star "multimodal
columns"). Completes the near-dup family across every modality — text
(ExactSubstr/MinHash/SimHash), images (dHash), audio (envelope
fingerprint), video (per-frame dHash) — on the ONE shared topology:
single Arrow hash pass → banded inverted-index candidates → exact
refine, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.queries import QuerySpec

REGISTRY: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# audio_fp_pairs — perceptual near-dup pairs over the audio column
# ---------------------------------------------------------------------------


def q_audio_fp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio dedup end-to-end (operators/audiofp.py):
    documents synthesized into VALID 8-bit PCM WAVs (pure JVM byte
    concat — near-identical texts become near-identical waveforms),
    REAL RIFF/PCM sample decode + integer envelope-difference
    fingerprint in one Arrow pass, 8-band inverted-index candidates
    (exhaustive for Hamming ≤ 7 by pigeonhole), exact bit_count refine.
    Per-clip rollup to (media_a, dup-of counts) keeps the output
    stable — the image_dhash_pairs shape on the audio column.

    Rows-only by design: the oracle cannot decode audio bytes in SQL
    (the image_dhash_pairs precedent) — the decode/fingerprint kernel
    is instead pinned by tests/test_audiofp.py (hand-derived bits, an
    independent scalar reference, exact volume invariance, planted
    near-dup pairs, 16-bit/stereo/truncated decode edges)."""
    from data_lake_spark.operators.audiofp import (
        audio_pairs,
        wav_from_text_col,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = audio_pairs(wav_from_text_col(docs), max_hamming=6)
    return (
        pairs.groupBy("media_a")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_b").alias("first_dup"),
            F.min("hamming").alias("min_hamming"),
        )
        .orderBy("media_a")
    )


REGISTRY["audio_fp_pairs"] = QuerySpec(
    q_audio_fp_pairs,
    None,
    "perceptual audio dedup: real RIFF/PCM sample decode + integer "
    "envelope-difference fingerprint in one Arrow pass, 8-band Hamming "
    "LSH candidates, bit_count refine — rows-only (no SQL audio "
    "decode); kernel pinned by pytest",
)


# ---------------------------------------------------------------------------
# video_frame_pairs — frame-aligned near-dup pairs over the video column
# ---------------------------------------------------------------------------


def q_video_frame_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual video dedup end-to-end (operators/videofp.py):
    documents synthesized into VALID 4-frame uncompressed-DIB AVIs
    (pure JVM byte concat), REAL RIFF/AVI frame extraction + the image
    dHash kernel per frame in one Arrow pass, frame-aligned 8-band
    candidates, every-frame bit_count refine. Per-clip rollup keeps
    the output stable — the image/audio shape, one modality up.

    Rows-only by design: the oracle cannot walk a RIFF tree in SQL —
    the extraction/refine kernel is pinned by tests/test_videofp.py
    (synthesis round-trip vs the image kernel, planted frame-aligned
    near-dups, the one-bad-frame rejection, decode edges)."""
    from data_lake_spark.operators.videofp import (
        avi_from_text_col,
        video_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = video_pairs(avi_from_text_col(docs), max_hamming=6)
    return (
        pairs.groupBy("media_a")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_b").alias("first_dup"),
            F.max("max_frame_hamming").alias("worst_frame_hamming"),
        )
        .orderBy("media_a")
    )


REGISTRY["video_frame_pairs"] = QuerySpec(
    q_video_frame_pairs,
    None,
    "perceptual video dedup: real RIFF/AVI frame extraction + image "
    "dHash per frame in one Arrow pass, frame-aligned 8-band Hamming "
    "LSH candidates, every-frame bit_count refine — rows-only (no SQL "
    "container walk); kernel pinned by pytest",
)
