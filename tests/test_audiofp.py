"""Audio envelope fingerprint: hand-derived bits on a constructed WAV,
an independent scalar reference over varied clips, exact volume
invariance, real 16-bit/stereo/truncated decode edges, planted
near-dup pairs through the banded machinery, and keeper assignment —
the test_imagehash conventions applied to the audio column."""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F

from data_lake_spark.operators.audiofp import (
    _decode_wav_amplitude,
    audio_pairs,
    audiofp64,
    audiofp_table,
    dedup_audio,
    wav_from_text_col,
)

_N_WINDOWS = 65


def _wav(samples, bits=8, channels=1, rate=8000):
    """Valid RIFF/WAVE PCM bytes from signed sample values (stereo:
    interleaved)."""
    if bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        data = b"".join(struct.pack("<h", s) for s in samples)
    ba = channels * bits // 8
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<H", 1)
        + struct.pack("<H", channels)
        + struct.pack("<I", rate)
        + struct.pack("<I", rate * ba)
        + struct.pack("<H", ba)
        + struct.pack("<H", bits)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _reference_fp(amp):
    """Independent scalar formulation straight from the definition:
    65 integer-boundary windows, bit k iff mean_k > mean_{k+1} compared
    cross-multiplied."""
    n = len(amp)
    bounds = [(k * n) // _N_WINDOWS for k in range(_N_WINDOWS)] + [n]
    sums = [
        sum(amp[bounds[k] : bounds[k + 1]]) for k in range(_N_WINDOWS)
    ]
    cnts = [bounds[k + 1] - bounds[k] for k in range(_N_WINDOWS)]
    bits = 0
    for k in range(_N_WINDOWS - 1):
        if sums[k] * cnts[k + 1] > sums[k + 1] * cnts[k]:
            bits |= 1 << k
    return bits


def test_hand_derived_bits_one_sample_per_window():
    # 65 samples = one per window: bit k is literally |s_k| > |s_k+1|.
    # Alternating loud/silent ⇒ every even bit set: 0x5555555555555555.
    samples = [10 if k % 2 == 0 else 0 for k in range(65)]
    assert audiofp64(_wav(samples)) == 0x5555555555555555
    # monotone ramp: every comparison is 'less than' ⇒ no bits
    assert audiofp64(_wav(list(range(65)))) == 0
    # reversed ramp: every bit
    assert audiofp64(_wav(list(range(64, -1, -1)))) == (1 << 64) - 1


def test_matches_independent_scalar_reference():
    rng = random.Random(42)
    for n in (65, 66, 100, 1040, 2377):
        samples = [rng.randint(-127, 127) for _ in range(n)]
        amp = [abs(s) for s in samples]
        assert audiofp64(_wav(samples)) == _reference_fp(amp), n


def test_volume_scaling_is_exactly_invariant():
    rng = random.Random(7)
    samples = [rng.randint(-800, 800) for _ in range(333)]
    quiet = audiofp64(_wav(samples, bits=16))
    loud = audiofp64(_wav([s * 37 for s in samples], bits=16))
    assert quiet == loud  # cross-multiplied comparison, no division


def test_decode_edges_stereo_16bit_truncated_and_garbage():
    rng = random.Random(3)
    left = [rng.randint(-500, 500) for _ in range(200)]
    right = [rng.randint(-500, 500) for _ in range(200)]
    inter = [v for lr in zip(left, right) for v in lr]
    amp = _decode_wav_amplitude(_wav(inter, bits=16, channels=2))
    # channels sum to mono in integer arithmetic
    assert list(amp) == [abs(a + b) for a, b in zip(left, right)]

    # truncated data chunk: the partial final frame is dropped
    full = _wav(inter, bits=16, channels=2)
    cut = full[:-5]
    amp_cut = _decode_wav_amplitude(cut)
    assert amp_cut is not None and len(amp_cut) == 198

    # non-WAV bytes, compressed fmt, too-short clips ⇒ None
    assert audiofp64(b"not audio at all") is None
    assert audiofp64(_wav([1, 2, 3])) is None  # < 65 samples
    mp3ish = bytearray(_wav([0] * 100))
    mp3ish[20:22] = struct.pack("<H", 85)  # fmt tag: MPEG, not PCM
    assert audiofp64(bytes(mp3ish)) is None


def test_table_null_and_undecodable_survive(spark):
    rows = [
        (1, _wav([10 if k % 2 == 0 else 0 for k in range(65)])),
        (2, b"garbage"),
        (3, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r["afp"] for r in audiofp_table(media).collect()}
    assert got[1] == 0x5555555555555555
    assert got[2] is None and got[3] is None


def test_planted_near_dups_pair_and_distinct_do_not(spark):
    base = "the quick brown fox jumps over the lazy dog " * 30  # > 1040
    nearly = base[:500] + "X" + base[501:]  # one byte perturbed
    other = "completely different audio content here " * 30
    docs = spark.createDataFrame(
        [(1, base), (2, nearly), (3, other)], "doc_id long, text string"
    )
    pairs = audio_pairs(wav_from_text_col(docs), max_hamming=6).collect()
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 2  # one window perturbed
    assert not any(3 in p for p in got)


def test_dedup_audio_keeper_assignment(spark):
    base = "repeated audio clip payload words here " * 30
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base[:300] + "Y" + base[301:]),  # near-dup of 1
            (3, "some other recording entirely " * 40),
            (4, None),  # NULL text -> NULL content -> own keeper
        ],
        "doc_id long, text string",
    )
    media = wav_from_text_col(docs)
    out = {
        r["media_id"]: (r["keeper"], r["is_dup"])
        for r in dedup_audio(media, max_hamming=6).collect()
    }
    assert out[1] == (1, False)
    assert out[2] == (1, True)  # family collapses to the min id
    assert out[3] == (3, False)
    assert out[4] == (4, False)  # undecodable survives as its own keeper

    # idempotent: deduping the kept set again removes nothing
    keepers = media.join(
        spark.createDataFrame(
            [(m,) for m, (_, d) in out.items() if not d], "media_id long"
        ),
        "media_id",
    )
    again = dedup_audio(keepers, max_hamming=6).collect()
    assert all(not r["is_dup"] for r in again)


def test_audiofp64_batch_bit_identical_to_scalar_kernel():
    """r11: the vectorized batch fingerprint must agree with the scalar
    reference — mixed lengths, 8/16-bit, multi-channel, too-short,
    garbage, Nones — and must take the exact-Python fallback when the
    int64 cross-multiply bound could overflow (large 16-bit clips)."""
    import random
    import struct as st

    from data_lake_spark.operators.audiofp import audiofp64, audiofp64_batch

    rng = random.Random(11)

    def wav(n, bits=8, ch=1):
        data = bytes(rng.randrange(256) for _ in range(n * ch * (bits // 8)))
        fmt = st.pack("<HHIIHH", 1, ch, 8000, 8000 * ch * bits // 8, ch * bits // 8, bits)
        body = (
            b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(data)) + data
        )
        return b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body

    cases = []
    for n in (1040, 1040, 65, 64, 200, 1041):
        cases.extend(wav(n) for _ in range(3))
    cases += [wav(130, bits=16, ch=2), wav(1040, bits=16, ch=2)]
    cases += [None, b"nope", wav(1040)[:50], wav(200000, bits=16)]
    rng.shuffle(cases)
    got = audiofp64_batch(cases)
    want = [audiofp64(bytes(c)) if c is not None else None for c in cases]
    assert got == want
