"""Property-based invariants for SCD2 folding (operators/scd.py) and
sequence packing (operators/packing.py) — the operators whose semantics
are easy to break subtly and hard to cover with example tests.

SCD2 invariants, for ANY update stream:
- per key, versions tile the timeline: valid_from strictly increasing
  and each valid_to equals the next version's valid_from;
- exactly one open (is_current) version per key, and it is the last;
- consecutive versions always differ in attributes (no-op updates fold
  away), which also makes the fold idempotent.

Packing invariants, for ANY token-count multiset:
- start offsets are the exclusive running sum in order;
- seq_id is non-decreasing and equals start_off // budget;
- per-group total tokens are preserved.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lake_spark.operators.packing import pack_sequences
from data_lake_spark.operators.scd import scd2_apply

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# update streams: few keys, few attr values, dates from a small pool so
# hypothesis actually generates same-key chains and no-op repeats
_UPDATES = st.lists(
    st.tuples(
        st.integers(1, 3),  # key
        st.sampled_from(["A", "B", "C"]),  # attr
        st.sampled_from([f"2024-0{m}-01" for m in range(1, 8)]),  # eff
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[2]),  # one update per (key, day)
)


@given(upd=_UPDATES)
@settings(**_SETTINGS)
def test_scd2_versions_tile_the_timeline(spark, upd):
    cur = spark.createDataFrame([], "uid long, office string, valid_from string")
    updates = spark.createDataFrame(upd, "uid long, office string, eff_date string")
    out = scd2_apply(cur, updates, key="uid", attrs=["office"]).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.uid, []).append(r)
    for uid, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        # tiling: each version closes exactly where the next opens
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from, (uid, rows)
            assert a.is_current == 0
            assert a.office != b.office  # no-ops folded away
        assert rows[-1].is_current == 1  # exactly one open version, last
        assert sum(r.is_current for r in rows) == 1


@given(upd=_UPDATES)
@settings(**_SETTINGS)
def test_scd2_fold_idempotent(spark, upd):
    cur = spark.createDataFrame([], "uid long, office string, valid_from string")
    updates = spark.createDataFrame(upd, "uid long, office string, eff_date string")
    once = scd2_apply(cur, updates, key="uid", attrs=["office"])
    # re-fold the produced dimension with the same updates: no change
    twice = scd2_apply(
        once.select("uid", "office", "valid_from"),
        updates,
        key="uid",
        attrs=["office"],
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(
    toks=st.lists(st.integers(1, 3000), min_size=1, max_size=25),
    budget=st.sampled_from([512, 2048]),
)
@settings(**_SETTINGS)
def test_packing_invariants(spark, toks, budget):
    rows = [(i, "g", t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = sorted(
        pack_sequences(
            df, budget=budget, group_cols=["lang"], order_cols=["doc_id"]
        ).collect(),
        key=lambda r: r.doc_id,
    )
    run = 0
    prev_seq = 0
    for r in out:
        assert r.start_off == run  # exclusive running sum
        assert r.seq_id == r.start_off // budget
        assert r.seq_id >= prev_seq  # non-decreasing in order
        prev_seq = r.seq_id
        run += r.n_tokens
    assert run == sum(toks)  # token mass preserved
