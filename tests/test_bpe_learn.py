"""operators/bpe.bpe_learn vs a plain-Python BPE reference: identical
merge lists and identical final symbolizations, deterministic under
repartitioning, leftmost-first overlap resolution."""

from __future__ import annotations

import pytest

from data_lake_spark.operators.bpe import bpe_learn


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich-style reference: chars + </w>, argmax pair by (count,
    then lexicographic min), leftmost-first merge application."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + word_counts[w]
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out, skip = [], False
            for i, s in enumerate(syms):
                if skip:
                    skip = False
                    continue
                if s == a and i + 1 < len(syms) and syms[i + 1] == b:
                    out.append(a + b)
                    skip = True
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


_WORDS = (
    ["lower"] * 5 + ["lowest"] * 3 + ["newer"] * 6 + ["wider"] * 2
    + ["aaa"] * 4  # overlapping-pair case: (a,a) must merge leftmost-first
)


@pytest.fixture(scope="module")
def learned(spark):
    docs = spark.createDataFrame([(" ".join(_WORDS),)], "text string")
    merges, vocab = bpe_learn(docs, n_merges=8)
    syms = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
    return merges, syms


def test_merges_match_python_reference(learned):
    merges, syms = learned
    wc: dict[str, int] = {}
    for w in _WORDS:
        wc[w] = wc.get(w, 0) + 1
    ref_merges, ref_vocab = _ref_bpe(wc, 8)
    assert merges == ref_merges
    assert syms == ref_vocab


def test_overlap_resolves_leftmost_first(learned):
    merges, syms = learned
    # 'aaa</w>': whatever round (a,a) merged in, the leftmost pair won:
    # the final symbolization starts with a symbol beginning 'aa'
    assert syms["aaa"][0].startswith("aa")


def test_deterministic_under_repartitioning(spark, learned):
    merges, syms = learned
    docs = spark.createDataFrame(
        [(w,) for w in _WORDS], "text string"
    ).repartition(9)
    merges2, vocab2 = bpe_learn(docs, n_merges=8)
    assert merges2 == merges
    assert {r["word"]: list(r["symbols"]) for r in vocab2.collect()} == syms


def test_early_stop_when_nothing_repeats(spark):
    docs = spark.createDataFrame([("ab cd ef",)], "text string")
    merges, _ = bpe_learn(docs, n_merges=10)
    assert merges == []  # every adjacent pair occurs once (< 2)


def test_driver_path_matches_distributed_path(spark, learned):
    # the r10 driver-side fold (vocab counted ≤ driver_max_words) must
    # pick the same merges and symbolizations as the distributed merge
    # rounds (driver_max_words=0 forces them — the graph.py convention)
    merges, syms = learned
    docs = spark.createDataFrame([(" ".join(_WORDS),)], "text string")
    merges_dist, vocab_dist = bpe_learn(docs, n_merges=8, driver_max_words=0)
    assert merges_dist == merges
    assert {
        r["word"]: list(r["symbols"]) for r in vocab_dist.collect()
    } == syms
