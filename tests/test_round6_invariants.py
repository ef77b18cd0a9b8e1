"""Semantic invariants for the round-6 queries — properties the oracle
parity can't see (parity proves both engines agree; these prove the
agreed answer means what the docstring claims)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_spark.queries import full_registry

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
_REG = full_registry()
_SCALE = 1_000_000


def test_dist_drift_total_row_is_the_sum(spark):
    rows = _REG["dist_drift"].fn(spark, SF).collect()
    detail = [r for r in rows if r.bin >= 0]
    total = [r for r in rows if r.bin == -1]
    assert len(total) == 1 and detail
    t = total[0]
    for col in ("a_cnt", "b_cnt", "l1_micro", "chi2_micro"):
        assert t[col] == sum(r[col] for r in detail)
    # micro-shares per cohort sum to 1e6 up to per-bin floor loss
    for col in ("a_micro", "b_micro"):
        assert _SCALE - len(detail) <= t[col] <= _SCALE
    # the drift terms are bounded: L1 <= 2e6, chi2 term <= |p - q|
    assert 0 <= t.l1_micro <= 2 * _SCALE
    for r in detail:
        assert r.chi2_micro <= r.l1_micro


def test_lang_confusion_marginals(spark):
    rows = _REG["lang_confusion"].fn(spark, SF).collect()
    n_docs = (
        _REG["text_stats"].fn(spark, SF).count()
        if "text_stats" in _REG
        else None
    )
    assert sum(r.n for r in rows) == n_docs
    # per gold label, recall over its row sums to 1e6 up to floor loss
    from collections import defaultdict

    by_label = defaultdict(list)
    for r in rows:
        by_label[r.labeled_lang].append(r)
    for cells in by_label.values():
        s = sum(c.recall_micro for c in cells)
        assert _SCALE - len(cells) <= s <= _SCALE
    # the classifier only ever predicts its three profiles
    assert {r.predicted_lang for r in rows} <= {"en", "es", "fr"}


def test_embedding_coverage_accounts_for_every_doc(spark):
    rows = _REG["embedding_coverage"].fn(spark, SF).collect()
    orphan = [r for r in rows if r.source == "(orphan vectors)"]
    sources = [r for r in rows if r.source != "(orphan vectors)"]
    assert len(orphan) == 1 and sources
    from data_lake_spark.catalog import load_table

    n_docs = load_table(spark, SF, "documents").count()
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert sum(r.n_docs for r in sources) == n_docs
    # matched + orphans account for every vector exactly once
    assert sum(r.n_with_vec for r in sources) + orphan[0].n_with_vec == n_vecs
    for r in sources:
        assert 0 <= r.n_with_vec <= r.n_docs
        assert r.coverage_micro == (r.n_with_vec * _SCALE) // r.n_docs


def test_dup_histogram_sums_to_the_corpus(spark):
    rows = _REG["dup_histogram"].fn(spark, SF).collect()
    from data_lake_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    assert sum(r.family_size * r.n_families for r in rows) == docs.count()
    for r in rows:
        assert r.redundant_docs == (r.family_size - 1) * r.n_families
        if r.family_size == 1:
            assert r.redundant_tokens == 0


def test_bpe_fertility_bounds(spark):
    rows = _REG["bpe_fertility"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # every word is at least one BPE token, at most its chars + </w>
        assert r.n_bpe_tokens >= r.n_words
        assert r.n_bpe_tokens <= r.n_chars + r.n_words
        assert r.tokens_per_word_micro >= _SCALE
        assert r.chars_per_token_micro > 0


def test_exact_substr_clean_conserves_tokens(spark):
    out = _REG["exact_substr_clean"].fn(spark, SF)
    from data_lake_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    j = out.join(docs, "doc_id").collect()
    assert j
    for r in j:
        assert r.n_kept + r.n_removed == r.n_tok
        # clean_text token count == n_kept (empty text = 0 tokens)
        n_clean = len(r.clean_text.split()) if r.clean_text else 0
        assert n_clean == r.n_kept


def test_decontam_substr_spans_only_in_train_docs(spark):
    rows = _REG["decontam_substr"].fn(spark, SF).collect()
    for r in rows:
        assert r.doc_id >= 10  # never flags the benchmark side
        assert r.span_tokens >= 13
        assert r.span_start >= 0


def test_exact_substr_pairs_provenance_consistent(spark):
    # every (copy, keeper) pair points at a genuinely different doc,
    # and every doc reported by exact_substr as carrying a span has at
    # least one provenance pair (spans and pairs see the same index)
    pairs = _REG["exact_substr_pairs"].fn(spark, SF).collect()
    span_docs = {
        r.doc_id for r in _REG["exact_substr"].fn(spark, SF).collect()
    }
    pair_docs = {r.doc_id for r in pairs}
    for r in pairs:
        assert r.doc_id != r.src_doc or r.shared_grams > 0
        assert r.shared_grams >= 11 and r.first_pos >= 0
    assert span_docs <= pair_docs


def test_temp_weights_dampens_toward_uniform(spark):
    rows = _REG["temp_weights"].fn(spark, SF).collect()
    assert len(rows) >= 2
    # weights are a (floored) distribution
    s = sum(r.weight_micro for r in rows)
    assert _SCALE - len(rows) <= s <= _SCALE
    # sqrt damping: order preserved, but every language sits BETWEEN
    # its raw share and the uniform share (the temperature contract)
    uniform = _SCALE // len(rows)
    for r in rows:
        lo, hi = sorted((r.share_micro, uniform))
        assert lo - 2 <= r.weight_micro <= hi + 2
        # boost > 1e6 iff the language is below uniform share
        if r.share_micro < uniform:
            assert r.boost_micro >= _SCALE
        if r.share_micro > uniform:
            assert r.boost_micro <= _SCALE


def test_ivf_balance_is_a_distribution(spark):
    rows = _REG["ivf_balance"].fn(spark, SF).collect()
    assert rows
    s = sum(r.share_micro for r in rows)
    assert _SCALE - len(rows) <= s <= _SCALE
    # load factors average 1e6 by construction (n*cells/tot sums to
    # cells*1e6 up to floor loss), and every cell is non-empty
    ls = sum(r.load_micro for r in rows)
    assert len(rows) * _SCALE - len(rows) <= ls <= len(rows) * _SCALE
    for r in rows:
        assert r.n_vecs > 0
        assert r.load_micro == (r.n_vecs * len(rows) * _SCALE) // sum(
            x.n_vecs for x in rows
        )
