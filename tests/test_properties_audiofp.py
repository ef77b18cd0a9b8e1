"""Property-based checks (hypothesis) for the audio-dedup kernel: the
numpy fingerprint path is bit-identical to an independent scalar
reference on arbitrary PCM clips (either bit depth, any channel count,
any length), decode is an exact sample round-trip, volume scaling is
an exact invariance, and Hamming banding never misses a pair within
its guarantee radius (the imagehash property conventions on the audio
column). Pure-Python properties — no Spark session, so hypothesis can
afford real example counts here."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_lake_spark.operators.audiofp import (
    _N_WINDOWS,
    _decode_wav_amplitude,
    audiofp64,
)
from tests.test_audiofp import _wav


def _fp_reference(amp):
    """Independent scalar reformulation of the fingerprint spec."""
    n = len(amp)
    bounds = [(k * n) // _N_WINDOWS for k in range(_N_WINDOWS)] + [n]
    bits = 0
    for k in range(_N_WINDOWS - 1):
        s_k = sum(amp[bounds[k] : bounds[k + 1]])
        s_k1 = sum(amp[bounds[k + 1] : bounds[k + 2]])
        c_k = bounds[k + 1] - bounds[k]
        c_k1 = bounds[k + 2] - bounds[k + 1]
        if s_k * c_k1 > s_k1 * c_k:
            bits |= 1 << k
    return bits


clips8 = st.lists(
    st.integers(min_value=-128, max_value=127), min_size=65, max_size=400
)
clips16 = st.lists(
    st.integers(min_value=-32768, max_value=32767),
    min_size=65,
    max_size=400,
)


@settings(max_examples=60, deadline=None)
@given(clips8)
def test_fp_matches_scalar_reference_8bit(samples):
    assert audiofp64(_wav(samples)) == _fp_reference(
        [abs(s) for s in samples]
    )


@settings(max_examples=60, deadline=None)
@given(clips16)
def test_fp_matches_scalar_reference_16bit(samples):
    assert audiofp64(_wav(samples, bits=16)) == _fp_reference(
        [abs(s) for s in samples]
    )


@settings(max_examples=40, deadline=None)
@given(clips16, st.integers(min_value=2, max_value=40))
def test_volume_scaling_exactly_invariant(samples, c):
    # keep the scaled samples inside int16 so the WAV stays encodable
    base = [s // 64 for s in samples]
    assert audiofp64(_wav(base, bits=16)) == audiofp64(
        _wav([s * c for s in base], bits=16)
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=65,
        max_size=200,
    )
)
def test_stereo_decode_sums_channels_exactly(frames):
    inter = [v for lr in frames for v in lr]
    amp = _decode_wav_amplitude(_wav(inter, bits=16, channels=2))
    assert list(amp) == [abs(a + b) for a, b in frames]


@settings(max_examples=40, deadline=None)
@given(clips8, st.integers(min_value=0, max_value=63), st.data())
def test_banding_never_misses_within_radius(samples, seed_bit, data):
    # flip up to 7 of the 64 fingerprint bits: by pigeonhole at least
    # one of the 8 bands is untouched, so a band collision is
    # GUARANTEED — the deterministic recall argument hamming_pairs and
    # the streaming screens rely on
    fp = audiofp64(_wav(samples))
    flips = data.draw(
        st.sets(st.integers(min_value=0, max_value=63), max_size=7)
    )
    other = fp
    for b in flips:
        other ^= 1 << b
    bands_a = [(fp >> (8 * i)) & 0xFF for i in range(8)]
    bands_b = [(other >> (8 * i)) & 0xFF for i in range(8)]
    assert any(x == y for x, y in zip(bands_a, bands_b))
