"""Connected components: chains, singletons, and partition insensitivity."""

from __future__ import annotations

from data_lake_spark.operators.graph import connected_components


def test_components_chain_and_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 9]], "node long")
    # chain 1-2-3-4 (diameter > 1 forces multiple rounds), pair 5-6, isolated 9
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 6)], "a long, b long"
    )
    got = {r.node: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 9: 9}


def test_components_partition_insensitive(spark):
    nodes = spark.createDataFrame([(i,) for i in range(30)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 28, 3)]  # short chains
        + [(0, 29)],
        "a long, b long",
    )
    a = sorted(connected_components(nodes, edges).collect())
    b = sorted(
        connected_components(nodes.repartition(7), edges.repartition(5)).collect()
    )
    assert a == b


def test_driver_and_distributed_paths_agree(spark):
    """The adaptive driver union-find must label identically to the
    distributed iterative fixpoint (driver_max_edges=0 forces it)."""
    from pyspark.sql import functions as F

    from data_lake_spark.operators.graph import connected_components

    nodes = spark.range(0, 60).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20)]          # one 21-chain
        + [(30, 31), (31, 32), (30, 32)]            # a triangle
        + [(40 + i, 50 + i) for i in range(5)],     # five 2-cliques
        "a long, b long",
    )
    fast = {
        (r.node, r.cluster_id)
        for r in connected_components(nodes, edges).collect()
    }
    slow = {
        (r.node, r.cluster_id)
        for r in connected_components(nodes, edges, driver_max_edges=0).collect()
    }
    assert fast == slow
    assert (0, 0) in fast and (20, 0) in fast       # chain collapses to 0
    assert (32, 30) in fast and (54, 44) in fast
    assert (55, 55) in fast  # isolated node stays a singleton
