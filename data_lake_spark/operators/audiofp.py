"""Perceptual audio dedup: envelope-difference fingerprint over REAL
WAV decode + the Hamming-banded pair machinery.

Closes the multimodal dedup family: text (operators/textdedup.py),
images (operators/imagehash.py), and now audio — all three share the
same near-dup topology (one Arrow hash pass → banded inverted-index
candidates → exact refine → connected components), because from the
64-bit hash on the machinery is format-agnostic
(imagehash.hamming_pairs takes ``hash_col``).

The decode is REAL: a dependency-free RIFF/WAVE PCM reader (PCM sample
data is raw integers — no codec needed, the BMP argument applied to
audio; multimodal.wav_info already walks these chunks for metadata,
this module reads the samples). 8-bit unsigned and 16-bit signed PCM,
any channel count (channels sum to mono in integer arithmetic).
Non-WAV/compressed audio returns None ⇒ NULL fingerprint, same
contract as undecodable images.

The fingerprint is the dHash idea applied to the WAVEFORM ENVELOPE
(the time-domain cousin of the Haitsma–Kalker energy-difference
fingerprint, 2002 — public literature): split the absolute-amplitude
signal into 65 integer-boundary windows and set bit k iff window k's
mean energy exceeds window k+1's. Comparisons are CROSS-MULTIPLIED
(sum_k·cnt_{k+1} > sum_{k+1}·cnt_k, arbitrary-precision Python ints)
instead of divided, so the fingerprint is EXACTLY invariant under
volume scaling and free of integer-division rounding — deterministic
across platforms, like dhash64's all-integer pipeline.

100 TB: one Arrow pass per clip (Python touches each clip once),
8 small rows per clip into the band shuffle, candidates from bucket
collisions never all-pairs, CC on the sparse verified edge set — the
image-dedup scale story verbatim.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_N_WINDOWS = 65  # 65 windows ⇒ 64 consecutive-difference bits

#: synthesized clip geometry: 8 kHz mono 8-bit PCM, 1040 samples
#: (= 65·16, so every window is exactly 16 samples — no ragged tails)
_RATE = 8000
_N_SAMPLES = 1040
_WAV_HEADER = (
    b"RIFF"
    + struct.pack("<I", 36 + _N_SAMPLES)  # riff payload size
    + b"WAVE"
    + b"fmt "
    + struct.pack("<I", 16)  # fmt chunk size
    + struct.pack("<H", 1)  # PCM
    + struct.pack("<H", 1)  # mono
    + struct.pack("<I", _RATE)
    + struct.pack("<I", _RATE)  # byte rate (8-bit mono)
    + struct.pack("<H", 1)  # block align
    + struct.pack("<H", 8)  # bits per sample
    + b"data"
    + struct.pack("<I", _N_SAMPLES)
)


def wav_from_text_col(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (media_id, content) where content is a VALID
    8-bit PCM WAV whose samples are the document's first 1040 text
    bytes (space-padded) — pure JVM concat of a binary literal and
    encoded text, zero Python. Near-identical documents therefore
    yield near-identical waveforms: the honest way to get a
    dedup-shaped audio corpus out of text-only testdata (the
    imagehash.bmp_from_text_col argument applied to audio)."""
    from data_lake_spark.operators.imagehash import ascii_text

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.lit(_WAV_HEADER),
            F.encode(
                F.rpad(
                    F.substring(ascii_text("text"), 1, _N_SAMPLES),
                    _N_SAMPLES,
                    " ",
                ),
                "UTF-8",
            ),
        ).alias("content"),
    )


def _decode_wav_amplitude(content: bytes):
    """Absolute-amplitude mono signal (numpy int64 array) from a
    RIFF/WAVE PCM byte string, or None for anything else. Real decode:
    walks the chunk list, honors the fmt chunk (8-bit unsigned with
    the 128 bias removed, or 16-bit signed little-endian), sums
    channels to mono in integer arithmetic. Truncated data chunks
    clamp to the bytes actually present (a partial final frame is
    dropped), mirroring how players treat truncated files."""
    import numpy as np

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    fmt = channels = bits = None
    data = None
    i = 12
    while i + 8 <= len(content):
        cid = content[i : i + 4]
        size = struct.unpack("<I", content[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(content):
            fmt = struct.unpack("<H", content[i + 8 : i + 10])[0]
            channels = struct.unpack("<H", content[i + 10 : i + 12])[0]
            bits = struct.unpack("<H", content[i + 22 : i + 24])[0]
        elif cid == b"data":
            data = content[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt != 1 or not channels or bits not in (8, 16) or data is None:
        return None
    if bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    else:
        n2 = len(data) - (len(data) % 2)
        s = np.frombuffer(data[:n2], dtype="<i2").astype(np.int64)
    n = (len(s) // channels) * channels
    if n == 0:
        return None
    mono = s[:n].reshape(-1, channels).sum(axis=1)
    return np.abs(mono)


def audiofp64(content: bytes) -> Optional[int]:
    """64-bit envelope-difference fingerprint: real PCM decode, 65
    integer-boundary windows over the absolute-amplitude signal, bit k
    set iff window k's mean energy > window k+1's — compared
    cross-multiplied in exact integer arithmetic (see module
    docstring), so scaling every sample by a constant leaves the
    fingerprint bit-identical. Returns None for undecodable content or
    clips shorter than 65 samples."""
    import numpy as np

    amp = _decode_wav_amplitude(content)
    if amp is None or len(amp) < _N_WINDOWS:
        return None
    n = len(amp)
    bounds = [(k * n) // _N_WINDOWS for k in range(_N_WINDOWS)] + [n]
    sums = np.add.reduceat(amp, bounds[:-1])
    bits = 0
    for k in range(_N_WINDOWS - 1):
        s_k, s_k1 = int(sums[k]), int(sums[k + 1])
        c_k = bounds[k + 1] - bounds[k]
        c_k1 = bounds[k + 2] - bounds[k + 1]
        # exact mean comparison without division: Python ints, no
        # overflow at any clip length, no rounding asymmetry
        if s_k * c_k1 > s_k1 * c_k:
            bits |= 1 << k
    return bits


def audiofp64_batch(contents) -> list:
    """Batch twin of :func:`audiofp64` (guide §4.2): clips are decoded
    individually (the RIFF walk is a few chunks), grouped by decoded
    sample count, and each group's window sums + cross-multiplied mean
    comparisons run as ONE vectorized numpy pass. The cross-multiply
    stays in int64 only when a conservative bound proves it cannot
    overflow (|sum|·max_window_len < 2⁶²); otherwise that group falls
    back to the scalar kernel's exact Python-int arithmetic — results
    are bit-identical either way (test-pinned). Returns unsigned
    ints-or-None in input order."""
    import numpy as np

    out: list = [None] * len(contents)
    groups: dict = {}
    for i, raw in enumerate(contents):
        if raw is None:
            continue
        amp = _decode_wav_amplitude(bytes(raw))
        if amp is None or len(amp) < _N_WINDOWS:
            continue
        groups.setdefault(len(amp), []).append((i, amp))
    for n, items in groups.items():
        arr = np.stack([a for _, a in items])  # (m, n) int64, all >= 0
        bounds = [(k * n) // _N_WINDOWS for k in range(_N_WINDOWS)] + [n]
        sums = np.add.reduceat(arr, bounds[:-1], axis=1)  # (m, 65)
        counts = np.diff(np.asarray(bounds, dtype=np.int64))  # (65,)
        if int(sums.max()) * int(counts.max()) < 1 << 62:
            left = sums[:, :-1] * counts[1:]
            right = sums[:, 1:] * counts[:-1]
            weights = np.uint64(1) << np.arange(
                _N_WINDOWS - 1, dtype=np.uint64
            )
            bits = ((left > right).astype(np.uint64) * weights).sum(
                axis=1, dtype=np.uint64
            )
            for (i, _), b in zip(items, bits):
                out[i] = int(b)
        else:
            for i, amp in items:
                s = [int(v) for v in np.add.reduceat(amp, bounds[:-1])]
                bits_i = 0
                for k in range(_N_WINDOWS - 1):
                    c_k = bounds[k + 1] - bounds[k]
                    c_k1 = bounds[k + 2] - bounds[k + 1]
                    if s[k] * c_k1 > s[k + 1] * c_k:
                        bits_i |= 1 << k
                out[i] = bits_i
    return out


def audiofp_table(media: DataFrame) -> DataFrame:
    """(media_id, content) → (media_id, afp long): the one Python pass
    (Arrow batches); undecodable or NULL content yields a NULL
    fingerprint rather than poisoning the batch. Two's-complement into
    signed long like dhash_table — banding and XOR read raw bits. The
    fingerprint math runs through the vectorized batch kernel (one
    numpy pass per same-length group — guide §4.2; scalar bit-identity
    test-pinned)."""
    from data_lake_spark.operators.imagehash import _signed64

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = _signed64(audiofp64_batch(pdf["content"]))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "afp": pd.array(fps, dtype="Int64")}
            )

    return media.mapInPandas(batches, schema="media_id long, afp long")


def audio_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate audio pairs: fingerprint once, then ride the
    imagehash banding machinery verbatim (exhaustive for Hamming ≤ 7
    by pigeonhole — deterministic, not probabilistic). Returns
    (media_a, media_b, hamming), media_a < media_b."""
    from data_lake_spark.operators.imagehash import hamming_pairs

    return hamming_pairs(
        audiofp_table(media),
        max_hamming=max_hamming,
        n_bands=n_bands,
        max_bucket=max_bucket,
        hash_col="afp",
    )


def dedup_audio(
    media: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    max_bucket: int = 64,
) -> DataFrame:
    """The whole perceptual audio-dedup pipeline as one call — the
    dedup_images shape over the audio column: envelope fingerprint
    (one Arrow decode pass) → Hamming-banded candidate pairs →
    connected components → keep the min-id clip per duplicate family.

    Returns every input clip labeled: (media_id, keeper, is_dup).
    Undecodable clips fingerprint NULL, join nothing, and survive as
    their own keepers (route them to exact-byte dedup upstream).
    Idempotent for the same reason dedup_images is: a family collapses
    to its keeper and keepers share no sub-threshold pair."""
    from data_lake_spark.operators.graph import connected_components

    pairs = audio_pairs(
        media, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket
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
