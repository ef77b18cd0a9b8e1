"""Invariant checks for the round-5 governance/eval additions — the
properties oracle parity can't see (parity proves both engines agree;
these prove the numbers mean what the docstrings claim)."""

from __future__ import annotations

import os

from data_lake_spark.queries import full_registry

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
_REG = full_registry()

_SCALE = 1_000_000


def test_dq_checks_shares_and_flags_consistent(spark):
    rows = _REG["dq_checks"].fn(spark, SF).collect()
    assert len(rows) == 9
    for r in rows:
        assert 0 <= r.observed_micro <= _SCALE, r
        assert r.threshold_micro == _SCALE
        # ok must equal "observed saturates the threshold": a full pass
        # is exactly 10⁶ because the numerator equals the row count
        assert r.ok == (r.observed_micro == _SCALE), r
    # the generated testdata is referentially intact and value-clean;
    # the suite's one real catch is lineitem's compound key, which the
    # generator DOES duplicate (~23% of (l_orderkey, l_linenumber)
    # pairs repeat at sf0.001) — a data issue the suite exists to flag
    status = {(r.tbl, r.check): r.ok for r in rows}
    dup_key = ("lineitem", "unique_l_orderkey_linenumber")
    assert all(ok for chk, ok in status.items() if chk != dup_key)


def test_epoch_plan_budget_algebra(spark):
    rows = _REG["epoch_plan"].fn(spark, SF).collect()
    assert rows
    tot = sum(r.avail for r in rows)
    for r in rows:
        # demand math: wanted is the uniform share of the doubled budget
        assert r.wanted == (2 * tot) // len(rows)
        # grant never exceeds demand nor the 4-epoch supply cap
        assert r.granted <= r.wanted
        assert r.granted <= 4 * r.avail
        assert r.capped == (r.granted < r.wanted)
        # micro-epochs: capped rows pin at exactly 4e6; uncapped rows
        # floor-match wanted/avail to within one micro-step
        if r.capped:
            assert r.epochs_micro == 4 * _SCALE
        else:
            assert r.epochs_micro <= (r.wanted * _SCALE) // r.avail
            assert r.epochs_micro >= (r.wanted * _SCALE) // r.avail - 1


def test_classifier_eval_confusion_identities(spark):
    rows = _REG["classifier_eval"].fn(spark, SF).collect()
    assert rows
    tot = rows[0].tp + rows[0].fp + rows[0].fn + rows[0].tn
    pos = rows[0].tp + rows[0].fn
    prev_tp = None
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == tot  # partition of the corpus
        assert r.tp + r.fn == pos  # positives conserved at every cut
        assert 0 <= r.precision_micro <= _SCALE
        assert 0 <= r.recall_micro <= _SCALE
        assert 0 <= r.f1_micro <= _SCALE
        # raising the threshold can only shrink predicted positives
        if prev_tp is not None:
            assert r.tp <= prev_tp
        prev_tp = r.tp
    # the lowest threshold predicts everything positive: recall == 1
    assert rows[0].recall_micro == _SCALE
    assert rows[0].tp == pos and rows[0].tn == 0


def test_quality_tradeoff_monotone(spark):
    rows = _REG["quality_tradeoff"].fn(spark, SF).collect()
    assert rows
    assert rows[0].doc_share_micro == _SCALE  # lowest bar keeps all
    assert rows[0].tok_share_micro == _SCALE
    for a, b in zip(rows, rows[1:]):
        assert b.threshold > a.threshold
        assert b.docs_kept <= a.docs_kept
        assert b.toks_kept <= a.toks_kept
        assert b.doc_share_micro <= a.doc_share_micro


def test_label_affinity_diagonal_and_bounds(spark):
    rows = _REG["label_affinity"].fn(spark, SF).collect()
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    k = len(labels)
    assert len(rows) == k * (k + 1) // 2  # every unordered pair once
    for r in rows:
        assert r.label_a <= r.label_b
        if r.cos_micro is not None:
            assert -_SCALE - 1 <= r.cos_micro <= _SCALE
        if r.label_a == r.label_b and r.cos_micro is not None:
            # self-cosine is 1 up to the one floating divide's ulp + floor
            assert r.cos_micro >= _SCALE - 2


def test_source_lift_ranking_contract(spark):
    rows = _REG["source_lift"].fn(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        lifts = [r.lift_micro for r in rs if r.lift_micro is not None]
        assert lifts == sorted(lifts, reverse=True)  # ranked by lift
        for r in rs:
            assert r.c_t >= 5  # min-df floor applied
            assert r.c_st <= r.c_t
            assert 0 <= r.conc_micro <= _SCALE


def test_rolling_corr_bounds_and_window_contract(spark):
    rows = _REG["rolling_corr"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r.r_micro is not None:
            # |r| <= 1 up to the one floating divide's ulp + floor
            assert -_SCALE - 2 <= r.r_micro <= _SCALE + 1
        assert r.sx >= 0 and r.sy >= 0
    # self-correlation sanity on a constructed identical pair: the
    # moments algebra yields 1 up to the sqrt²-ulp + floor (the same
    # tolerance the label_affinity self-cosine check uses)
    import math

    n, sx, sxy, sxx = 28, 280, 2940, 2940  # x = y = 1..7 repeated
    num = n * sxy - sx * sx
    r = math.floor(num * 1e6 / (math.sqrt(n * sxx - sx * sx) ** 2))
    assert r >= 1_000_000 - 2


def test_k_anonymity_levels_consistent(spark):
    rows = _REG["k_anonymity"].fn(spark, SF).collect()
    classes = [r for r in rows if r.level == "class"]
    nations = {r.nationkey: r for r in rows if r.level == "nation"}
    assert nations  # rollup always present
    for c in classes:
        assert c.class_size < 5  # only violations listed
        assert c.rows_at_risk == c.class_size
        # every violating class's nation rollup accounts for it
        assert nations[c.nationkey].rows_at_risk >= c.class_size
    for n in nations.values():
        # min class at or below k implies at-risk rows, and vice versa
        assert (n.class_size < 5) == (n.rows_at_risk > 0)
