"""Accuracy contracts for the sketch queries (no cross-engine oracle —
sketch internals are engine-specific; see queries/sketches.py)."""

from __future__ import annotations

from data_lake_spark.queries import full_registry


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = full_registry()["approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        # rsd=0.02 requested; allow 3 sigma
        assert abs(r.approx_users - r.exact_users) <= max(
            3, 0.06 * r.exact_users
        ), (r.event_type, r.approx_users, r.exact_users)


def test_quantile_sketch_bounds(spark, sf_dir):
    """percentile_approx returns an order statistic (a real element), so
    the correct contract is RANK accuracy: the element's empirical CDF
    position must sit within the sketch tolerance of the target quantile.
    Comparing values against the interpolating exact percentile would
    fail whenever adjacent elements are far apart."""
    import bisect

    rows = full_registry()["quantile_sketch"].fn(spark, sf_dir).collect()
    assert rows
    from data_lake_spark.queries.temporal import _events_secs

    vals = {}
    for r in _events_secs(spark, sf_dir).select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for v in vals.values():
        v.sort()
    for r in rows:
        assert r.p50_approx <= r.p90_approx <= r.p99_approx
        v = vals[r.event_type]
        n = len(v)
        for a, q in [(r.p50_approx, 0.5), (r.p90_approx, 0.9), (r.p99_approx, 0.99)]:
            lo = bisect.bisect_left(v, a)
            hi = bisect.bisect_right(v, a)
            assert lo < hi, (r.event_type, a, "sketch value not in data")
            # any rank the element occupies may satisfy the quantile
            best = min(abs(rk / n - q) for rk in (lo, hi - 1))
            assert best <= 0.02 + 2.0 / n, (r.event_type, q, a, best)
