"""Property-based checks (hypothesis) for the ExactSubstr span algebra:
on randomly composed corpora (shared runs planted at random offsets in
random documents), spans never overlap within a document, always fall
inside it, only ever cover genuinely duplicated token runs, the
keeper's canonical occurrence survives, and the streaming-index path is
bit-identical to the batch rebuild. Each example runs Spark jobs, so a
handful of examples is the right cost (the test_properties
convention)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lake_spark.operators.textdedup import (
    exact_substr_spans,
    exact_substr_spans_from_index,
    token_kgrams,
)

_K = 4
_MIN = 6

# disjoint vocabularies: runs are detectable, filler never collides
_RUN_TOKENS = [f"r{i}" for i in range(40)]
_FILLER = [f"f{i}" for i in range(200)]

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _corpora(draw):
    """3-6 documents of unique filler; one shared run of _MIN.._MIN+6
    consecutive run-tokens planted into 2-3 of them at random offsets."""
    n_docs = draw(st.integers(min_value=3, max_value=6))
    run_len = draw(st.integers(min_value=_MIN, max_value=_MIN + 6))
    run_start = draw(st.integers(min_value=0, max_value=len(_RUN_TOKENS) - run_len))
    run = _RUN_TOKENS[run_start : run_start + run_len]
    carriers = sorted(
        draw(
            st.sets(
                st.integers(min_value=0, max_value=n_docs - 1),
                min_size=2,
                max_size=3,
            )
        )
    )
    docs, fill_idx = [], 0
    for i in range(n_docs):
        n_fill = draw(st.integers(min_value=_MIN, max_value=18))
        toks = _FILLER[fill_idx : fill_idx + n_fill]
        fill_idx += n_fill
        if i in carriers:
            at = draw(st.integers(min_value=0, max_value=len(toks)))
            toks = toks[:at] + run + toks[at:]
        docs.append((i, " ".join(toks)))
    return docs, run, carriers


@settings(**_SETTINGS)
@given(_corpora())
def test_spans_cover_only_duplicated_runs_and_never_overlap(spark, corpus):
    docs_rows, run, carriers = corpus
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    spans = exact_substr_spans(docs, k=_K, min_tokens=_MIN).collect()
    texts = dict(docs_rows)

    by_doc: dict = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_tokens))

    # exactly the non-keeper carriers report spans
    assert set(by_doc) == set(carriers[1:])
    for doc_id, ss in by_doc.items():
        toks = texts[doc_id].split(" ")
        ss.sort()
        prev_end = -1
        for start, n in ss:
            assert n >= _MIN
            assert 0 <= start and start + n <= len(toks)  # inside the doc
            assert start > prev_end  # no overlap
            prev_end = start + n - 1
            covered = toks[start : start + n]
            # spans may extend ≤ k-1 filler tokens past the run
            # (extend-and-merge, documented); the RUN portion must be
            # entirely inside and dominate the span
            run_part = [t for t in covered if t.startswith("r")]
            assert run_part == run
            assert n <= len(run) + (_K - 1)


@settings(**_SETTINGS)
@given(_corpora())
def test_stream_index_path_is_bit_identical_to_batch(spark, corpus):
    docs_rows, _, _ = corpus
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    # build the index as TWO merged halves (the streaming partial shape)
    # instead of one pass — the fold must be invisible
    from pyspark.sql import functions as F

    from data_lake_spark.operators.textdedup import _POS_BITS

    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    partials = []
    for half in (half_a, half_b):
        grams = token_kgrams(half, _K).withColumn(
            "enc", F.col("doc_id") * F.lit(_POS_BITS) + F.col("pos")
        )
        partials.append(
            grams.groupBy("h").agg(
                F.min("enc").alias("keeper"),
                F.count(F.lit(1)).cast("long").alias("c"),
            )
        )
    merged = (
        partials[0]
        .unionByName(partials[1])
        .groupBy("h")
        .agg(F.min("keeper").alias("keeper"), F.sum("c").alias("c"))
    )
    got = {
        tuple(r)
        for r in exact_substr_spans_from_index(
            docs, merged, k=_K, min_tokens=_MIN
        ).collect()
    }
    want = {
        tuple(r)
        for r in exact_substr_spans(docs, k=_K, min_tokens=_MIN).collect()
    }
    assert got == want
