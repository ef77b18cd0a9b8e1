"""The bench stdout contract: the driver's tail capture holds ~1900
chars and parses the LAST stdout line as the headline JSON. These
checks fail at CI time — not at driver time — when a headline addition
would overflow the capture (the BENCH_r03 "parsed: null" failure mode,
closed structurally in round 5)."""

from __future__ import annotations

import json

from bench import HEADLINE, STDOUT_OMIT


def _line_len(ndec: int, omit: frozenset[str] | set[str]) -> int:
    # worst realistic case: every kept query needs all ndec decimals
    # and a two-digit integer part ("12.34"), total in the hundreds
    times = {k: 12.0 + 0.34 for k in HEADLINE}
    return len(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": 123.456,
                "unit": "sec",
                "queries": {
                    k: round(v, ndec) for k, v in times.items() if k not in omit
                },
                "sf": 0.1,
            },
            separators=(",", ":"),
        )
    )


def test_headline_line_fits_driver_capture():
    # the encoder emits the first ladder rung that measures <= 1850
    # (bench.py main); the FINAL rung (1 decimal + omit set) must clear
    # that bar even in the worst case (two-digit times everywhere) or
    # no rung fits and the capture overflows — if this fails, extend
    # STDOUT_OMIT before adding to HEADLINE
    assert _line_len(1, STDOUT_OMIT) <= 1850


def test_omit_set_is_sane():
    # omitted names must actually be headline entries (a typo here
    # would silently omit nothing) and never a round-5+ addition that
    # still needs its first recorded number
    assert STDOUT_OMIT <= set(HEADLINE)
    fresh = {
        "dq_checks", "epoch_plan", "triangle_count", "classifier_eval",
        "quality_tradeoff", "source_lift", "label_affinity",
        "mirror_matrix", "rolling_corr", "k_anonymity",
    }
    assert not (STDOUT_OMIT & fresh)
