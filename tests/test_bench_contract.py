"""The bench stdout contract: the driver's tail capture holds ~1900
chars and parses the LAST stdout line as the headline JSON. These
checks fail at CI time — not at driver time — when a headline addition
would overflow the capture (the BENCH_r03 "parsed: null" failure mode).

Round 6 replaced the name-keyed dict + STDOUT_OMIT workaround with a
dense position-keyed encoding joined through bench_index.json, so every
headline query carries a parsed time again; the worst-case width model
here covers THREE-digit integer seconds (the round-5 advice: a 100 s+
query must not be the first thing that breaks the bound at runtime).
"""

from __future__ import annotations

import json
import os

from bench import HEADLINE, INDEX_FILE


def _line_len(ndec: int) -> int:
    # worst realistic case: every query needs all ndec decimals AND a
    # THREE-digit integer part (123.45) — no single headline query has
    # ever exceeded 4 s, but the model must not be the optimistic one
    times = {str(i): 123.0 + 0.45 for i in range(len(HEADLINE))}
    return len(
        json.dumps(
            {
                "metric": "headline_queries_total",
                # value is the sum: model 5 integer digits
                "value": 12345.678,
                "unit": "sec",
                "queries": {k: round(v, ndec) for k, v in times.items()},
                "sf": 0.1,
                "idx": "bench_index.json",
            },
            separators=(",", ":"),
        )
    )


def test_headline_line_fits_driver_capture():
    # the encoder emits the first ladder rung that measures <= 1850
    # (bench.py main): the PRIMARY rung (2 decimals) must clear the bar
    # at worst-case three-digit widths, so the ladder never actually
    # degrades precision in practice
    assert _line_len(2) <= 1850


def test_index_file_matches_headline():
    # bench_index.json is the judge's join key for the position-keyed
    # stdout dict — it must exist and list HEADLINE exactly, in order;
    # regenerate with `python bench.py --write-index` after any edit
    assert os.path.exists(INDEX_FILE), "run: python bench.py --write-index"
    with open(INDEX_FILE) as f:
        idx = json.load(f)["index"]
    assert idx == HEADLINE, "stale bench_index.json: python bench.py --write-index"


def test_headline_names_resolve():
    # every headline entry must be a registry query (a typo here fails
    # at bench time, which is a round too late)
    from data_lake_spark.queries import full_registry

    reg = full_registry()
    missing = [n for n in HEADLINE if n not in reg]
    assert not missing, missing


def test_eviction_tombstones_keep_positions_stable(monkeypatch):
    """r11 (PERF_r10's positional-join breakage): a future eviction must
    NOT shift any surviving query's position. Simulate evicting one
    mid-list query and pin (a) every surviving name keeps its index,
    (b) the evicted slot encodes as JSON null at its original position,
    (c) the line still fits the driver capture."""
    import bench

    victim = HEADLINE[100]
    monkeypatch.setattr(bench, "EVICTED", frozenset({victim}))
    times = {n: 1.23 for n in HEADLINE if n != victim}
    q = bench.dense_queries(times, 2)
    assert q[str(100)] is None
    for i, name in enumerate(HEADLINE):
        if name != victim:
            assert q[str(i)] == 1.23
    # HEADLINE itself is untouched by an eviction — positions stable
    # across the two index files by construction
    assert len(q) == len(HEADLINE)
    line = json.dumps({"queries": q}, separators=(",", ":"))
    assert '"100":null' in line


def test_evicted_names_stay_in_headline_and_index():
    # the tombstone contract: EVICTED ⊆ HEADLINE (a name leaves the
    # timing loop, never the position map), and the index publishes it
    import bench

    assert bench.EVICTED <= set(HEADLINE)
    with open(INDEX_FILE) as f:
        idx = json.load(f)
    assert sorted(bench.EVICTED) == idx.get("evicted", [])
