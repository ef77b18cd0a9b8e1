"""operators/graph.pagerank: integer fixed-point power iteration —
rank mass, dangling/isolated nodes, determinism across partitionings,
and agreement with a plain-Python reference implementation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_spark.operators.graph import PAGERANK_ONE, pagerank

# a small directed graph: 0 is a hub (everyone links to it), 4 is
# dangling (no out-edges), 5 is isolated
_EDGES = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (2, 3), (3, 4)]
_NODES = [0, 1, 2, 3, 4, 5]


@pytest.fixture(scope="module")
def ranks(spark):
    nodes = spark.createDataFrame([(n,) for n in _NODES], "node long")
    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    out = pagerank(nodes, edges, n_iter=3)
    return {r["node"]: r["rank_units"] for r in out.collect()}


def _reference(n_iter: int) -> dict[int, int]:
    """Driver-side replay of the exact integer schedule."""
    n = len(_NODES)
    tele = (PAGERANK_ONE * 15) // (100 * n)
    deg: dict[int, int] = {}
    for s, _ in _EDGES:
        deg[s] = deg.get(s, 0) + 1
    r = {v: PAGERANK_ONE // n for v in _NODES}
    for _ in range(n_iter):
        sums = {v: 0 for v in _NODES}
        for s, d in _EDGES:
            sums[d] += r[s] // deg[s]
        r = {v: tele + (85 * sums[v]) // 100 for v in _NODES}
    return r


def test_matches_integer_reference(ranks):
    assert ranks == _reference(3)


def test_hub_outranks_chain_and_isolated(ranks):
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > ranks[3] > ranks[5]


def test_isolated_node_has_teleport_rank_only(ranks):
    assert ranks[5] == (PAGERANK_ONE * 15) // (100 * len(_NODES))


def test_mass_conserved_up_to_floor_dust_and_dangling_leak(ranks):
    # the no-redistribution variant leaks the dangling node's damped
    # mass; everything else is bounded by floor dust — total stays
    # within [0.5, 1.0] of PAGERANK_ONE and never exceeds it
    total = sum(ranks.values())
    assert total <= PAGERANK_ONE
    assert total >= PAGERANK_ONE // 2


def test_bit_identical_across_partitionings(spark, ranks):
    nodes = spark.createDataFrame([(n,) for n in _NODES], "node long")
    edges = spark.createDataFrame(_EDGES, "src long, dst long").repartition(7)
    out = pagerank(nodes.repartition(5), edges, n_iter=3)
    assert {r["node"]: r["rank_units"] for r in out.collect()} == ranks


def test_driver_path_matches_distributed_path(spark, ranks):
    # r10 adaptive placement: the counted-small driver fold (the module
    # fixture's path) must agree bit-for-bit with the distributed
    # iteration (driver_max_edges=0 forces it)
    nodes = spark.createDataFrame([(n,) for n in _NODES], "node long")
    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    out = pagerank(nodes, edges, n_iter=3, driver_max_edges=0)
    assert {r["node"]: r["rank_units"] for r in out.collect()} == ranks


def test_empty_graph_is_all_teleport(spark):
    nodes = spark.createDataFrame([(n,) for n in _NODES], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(nodes, edges, n_iter=2)
    tele = (PAGERANK_ONE * 15) // (100 * len(_NODES))
    assert set(out.select("rank_units").distinct().toPandas()["rank_units"]) == {
        tele
    }
    assert out.count() == len(_NODES)
