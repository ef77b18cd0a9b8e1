"""connected_components_star: the O(log n) large-star/small-star CC —
label-equivalence with the min-label operator on cliques/chains/random
graphs, and convergence on a long chain where diameter-bound label
propagation would need thousands of rounds."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_lake_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _labels(df) -> dict:
    return {r["node"]: r["cluster_id"] for r in df.collect()}


def _run_both(spark, node_ids, edge_list):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = spark.createDataFrame(edge_list, "a long, b long")
    star = connected_components_star(spark.createDataFrame([(n,) for n in node_ids], "node long"), edges)
    # driver_max_edges=0 forces the distributed min-label path: both
    # fully-distributed algorithms must agree
    base = connected_components(nodes, edges, driver_max_edges=0)
    return _labels(star), _labels(base)


def test_cliques_and_isolated_match_label_propagation(spark):
    nodes = list(range(10))
    edges = [(0, 1), (1, 2), (2, 0), (4, 5), (5, 6)]  # 3,7,8,9 isolated
    star, base = _run_both(spark, nodes, edges)
    assert star == base
    assert star[3] == 3 and star[9] == 9
    assert star[0] == star[1] == star[2] == 0
    assert star[4] == star[5] == star[6] == 4


def test_random_graph_matches_label_propagation(spark):
    # deterministic pseudo-random edges from md5 (no random module seed
    # drift across interpreter versions)
    n = 120
    edges = []
    for i in range(300):
        h = hashlib.md5(f"edge:{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % n, int(h[8:16], 16) % n
        if a != b:
            edges.append((a, b))
    star, base = _run_both(spark, list(range(n)), edges)
    assert star == base


def test_long_chain_converges_in_log_rounds(spark):
    # a 2000-node chain has diameter 1999: min-label propagation would
    # need ~2000 rounds (its cap raises), large-star/small-star closes
    # it inside the 50-round cap — and labels everything with node 0
    n = 2000
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    out = connected_components_star(nodes, edges)
    agg = out.agg(
        F.countDistinct("cluster_id").alias("k"),
        F.min("cluster_id").alias("lo"),
        F.max("cluster_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (agg["k"], agg["lo"], agg["hi"], agg["n"]) == (1, 0, 0, n)


def test_empty_edges_all_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame([], "a long, b long")
    out = connected_components_star(nodes, edges)
    assert _labels(out) == {i: i for i in range(5)}


def test_label_propagation_escalates_to_star_on_long_chain(spark):
    # force the distributed min-label path with a cap far below the
    # chain's diameter: instead of failing, connected_components must
    # escalate to the star alternation and still return exact labels
    n = 400
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    out = connected_components(
        nodes, edges, max_iter=5, driver_max_edges=0
    )
    got = _labels(out)
    assert got == {i: 0 for i in range(n)}
