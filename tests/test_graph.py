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
