"""Connected components — the clustering stage that turns near-dup PAIRS
into dedup DECISIONS (cluster id = min reachable doc id; keeper = the
member equal to its cluster id).

Iterative min-label propagation: every node starts labeled with itself;
each round, a node takes the min of its own label and its neighbors'
labels; fixpoint = min id reachable. Each round is one equi-join + one
map-side-combinable min-aggregate — fully distributed; the driver only
checks the convergence counter. Rounds needed = graph diameter, which for
near-dup clusters is tiny (dup groups are dense); for adversarial
long-chain graphs switch to the large-star/small-star alternation
(Kiveris et al., "Connected Components in MapReduce", SoCC'14), which
converges in O(log n) rounds with the same per-round plan shape.

Lineage is cut with localCheckpoint each round so the plan doesn't grow
exponentially across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the min node id of its component.

    nodes: one column ``node_col`` (include isolated nodes — they become
    their own singleton clusters). edges: ``src_col``/``dst_col``,
    interpreted undirected. Returns (node, cluster_id). Raises if not
    converged within ``max_iter`` (raise the cap or switch algorithms).
    """
    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    ).localCheckpoint()  # materialize once; every round re-joins it
    labels = nodes.select(F.col(node_col).alias("node")).withColumn(
        "cluster_id", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.u == labels.node)
            .groupBy(F.col("v").alias("node2"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nmin"), F.col("cluster_id")),
                ).alias("cluster_id"),
                (F.col("nmin") < F.col("cluster_id")).alias("__changed"),
            )
        ).localCheckpoint(eager=False)
        # one job per round: the convergence counter is the action that
        # materializes the lazy checkpoint (separate eager-checkpoint +
        # count jobs would double the per-round job count)
        n_changed = new_labels.agg(
            F.sum(F.col("__changed").cast("long")).alias("n")
        ).collect()[0]["n"]
        labels = new_labels.drop("__changed")
        if not n_changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter or use large-star/small-star for long-chain graphs"
    )
