"""Property-based checks for takedown subtractability — the invariant
the whole tombstone design rests on: for ANY corpus and ANY delete
set, screening from the full-corpus per-(gram, document) postings with
the deleted documents' rows subtracted is BIT-IDENTICAL to rebuilding
the index from the surviving documents alone. If this ever breaks,
deleted content is leaking into dedup decisions (or survivors are
being over-deleted)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_K = 3
_MIN = 4

# small word alphabet forces heavy gram collisions — the interesting
# regime: shared runs, shared keepers, multi-doc gram families
_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "run"])
_DOC = st.lists(_WORD, min_size=_K, max_size=24).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=2, max_size=8)


@settings(**_SETTINGS)
@given(docs=_CORPUS, data=st.data())
def test_subtract_then_fold_equals_rebuild(spark, docs, data):
    from data_lake_spark.operators.textdedup import (
        _POS_BITS,
        exact_substr_spans,
        exact_substr_spans_from_index,
    )
    from data_lake_spark.streaming.incremental import _gram_partials

    rows = [(i + 1, t) for i, t in enumerate(docs)]
    dead = data.draw(
        st.sets(st.sampled_from([r[0] for r in rows]), max_size=len(rows) - 1)
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    survivors = df.filter(~F.col("doc_id").isin(list(dead)) if dead else F.lit(True))

    partials = _gram_partials(df, _K, "doc_id", "text")
    if dead:
        partials = partials.filter(
            ~F.expr(f"keeper DIV {_POS_BITS}").isin(list(dead))
        )
    index = partials.groupBy("h").agg(
        F.min("keeper").alias("keeper"), F.sum("c").alias("c")
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_tokens"])
        for r in exact_substr_spans_from_index(
            survivors, index, k=_K, min_tokens=_MIN
        ).collect()
    }
    want = {
        (r["doc_id"], r["span_start"], r["span_tokens"])
        for r in exact_substr_spans(
            survivors, k=_K, min_tokens=_MIN
        ).collect()
    }
    assert got == want
