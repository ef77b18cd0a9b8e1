"""Connected components — the clustering stage that turns near-dup PAIRS
into dedup DECISIONS (cluster id = min reachable doc id; keeper = the
member equal to its cluster id).

Adaptive, the same way Spark chooses broadcast vs shuffle joins:

- **Small edge lists** (≤ ``driver_max_edges``, default 5M pairs) are
  union-found on the driver in one pass — near-dup graphs are usually
  MUCH smaller than the corpus (edges exist only between candidate
  pairs that survived LSH + verify), so this path removes the per-round
  distributed-job latency entirely. Deterministic: identical labels to
  the iterative fixpoint.
- **Large edge lists** fall back to iterative min-label propagation:
  every node starts labeled with itself; each round, a node takes the
  min of its own label and its neighbors' labels; fixpoint = min id
  reachable. Each round is one equi-join + one map-side-combinable
  min-aggregate — fully distributed; the driver only checks the
  convergence counter. Rounds needed = graph diameter, which for
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

# Above this many edges the union-find rows stop being driver-safe and
# the iterative path takes over. 5M pairs ≈ tens of MB on the driver —
# the same order as a default broadcast-join table.
DRIVER_MAX_EDGES = 5_000_000


def _driver_union_find(
    nodes: DataFrame, edges: DataFrame, node_col: str, src_col: str, dst_col: str
) -> DataFrame:
    """Driver-side union-find over a (small, counted) edge list; returns
    (node, cluster_id) with cluster_id = min member id — bit-identical
    to the distributed fixpoint."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    rows = edges.select(src_col, dst_col).collect()
    members = set()
    for r in rows:
        a, b = r[src_col], r[dst_col]
        members.add(a)
        members.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # min member id per root over every node that appears in an edge
    min_of_root: dict = {}
    for m in members:
        root = find(m)
        cur = min_of_root.get(root)
        min_of_root[root] = m if cur is None or m < cur else cur
    mapping = [(m, min_of_root[find(m)]) for m in members]
    spark = nodes.sparkSession
    out = nodes.select(F.col(node_col).alias("node"))
    if not mapping:
        return out.withColumn("cluster_id", F.col("node"))
    schema = out.schema["node"].dataType.simpleString()
    map_df = spark.createDataFrame(
        mapping, f"node {schema}, __cid {schema}"
    )
    return (
        out.join(F.broadcast(map_df), "node", "left")
        .select(
            "node", F.coalesce("__cid", F.col("node")).alias("cluster_id")
        )
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 25,
    driver_max_edges: int = DRIVER_MAX_EDGES,
) -> DataFrame:
    """Label every node with the min node id of its component.

    nodes: one column ``node_col`` (include isolated nodes — they become
    their own singleton clusters). edges: ``src_col``/``dst_col``,
    interpreted undirected. Returns (node, cluster_id). Raises if the
    iterative path does not converge within ``max_iter`` (raise the cap
    or switch algorithms). ``driver_max_edges=0`` forces the distributed
    path (used by tests to prove the two paths agree).
    """
    # materialize the edge list once: the size probe needs it, and the
    # union below reads it twice (both directions)
    edges = edges.localCheckpoint(eager=False)
    if edges.count() <= driver_max_edges:
        return _driver_union_find(nodes, edges, node_col, src_col, dst_col)
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
