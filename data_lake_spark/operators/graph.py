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
  long-chain graphs :func:`connected_components_star` implements the
  large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce", SoCC'14), which converges in O(log n)
  rounds with the same per-round plan shape.

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
    nodes: DataFrame, rows: list, node_col: str, src_col: str, dst_col: str
) -> DataFrame:
    """Driver-side union-find over a (small, counted) edge-row list;
    returns (node, cluster_id) with cluster_id = min member id —
    bit-identical to the distributed fixpoint."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root
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
    # VALUES literal only for small mappings (values_df's contract);
    # the driver union-find path admits up to DRIVER_MAX_EDGES edges,
    # whose node set would render as a multi-hundred-MB SQL string —
    # past the threshold the parallelize path is the right tool
    if len(mapping) <= 10_000:
        from data_lake_spark.functions.localframe import values_df

        map_df = values_df(spark, mapping, f"node {schema}, __cid {schema}")
    else:
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
    interpreted undirected. Returns (node, cluster_id). If the
    iterative path has not converged within ``max_iter`` rounds (a
    graph whose diameter exceeds the cap — an adversarial chain, not a
    dup graph), it escalates to :func:`connected_components_star`,
    whose round count is O(log n) instead of the diameter — same label
    contract, so the escalation is invisible to callers.
    ``driver_max_edges=0`` forces the distributed path (used by tests
    to prove the paths agree).
    """
    # The probe IS the collect when the list is driver-safe: one
    # LIMIT(cap+1) job replaces the old count-then-collect pair
    # (returning ≤ cap rows proves the limit returned the ENTIRE edge
    # list). No checkpoint before the probe (r11): on the driver path —
    # every dedup graph under the cap — the probe is the edge list's
    # ONLY consumer, and the checkpoint bought nothing but ~0.5 s of
    # eager physical planning of the deep pairs pipeline per query
    # (the r10-measured per-checkpoint constant). Past the cap the
    # probe short-circuits cheaply (first partitions hit the limit)
    # and the distributed path below checkpoints ONCE for its
    # multi-round re-joins, exactly as before.
    probe = (
        edges.select(src_col, dst_col).limit(driver_max_edges + 1).collect()
    )
    if len(probe) <= driver_max_edges:
        return _driver_union_find(nodes, probe, node_col, src_col, dst_col)
    edges = edges.localCheckpoint(eager=False)
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
    # diameter > max_iter (an adversarial chain, not a dup graph):
    # escalate to the O(log n) star alternation instead of failing —
    # same (node, cluster_id = component min) contract, so callers
    # never see the difference
    return connected_components_star(
        nodes, edges, node_col=node_col, src_col=src_col, dst_col=dst_col
    )


# Fixed-point scale for exact PageRank arithmetic: ranks live as integer
# "rank units" (1.0 == 10^12) so every operation — the teleport term, the
# per-edge contribution split, the damping multiply — is integer `div`,
# which both Spark and any ANSI engine evaluate identically. Double
# arithmetic would make the fixpoint partition-order-dependent.
PAGERANK_ONE = 1_000_000_000_000


def _driver_pagerank(
    nodes: DataFrame,
    rows: list,
    n_iter: int,
    node_col: str,
    src_col: str,
    dst_col: str,
    damping_pct: int,
    n: int,
    teleport: int,
) -> DataFrame:
    """Driver-side power iteration over a (small, counted) edge list —
    the union-find placement argument applied to PageRank: rank state is
    only non-constant on edge-endpoint nodes (everyone else holds the
    bare teleport term after round 1), and the endpoint set is bounded
    by the counted edge list. All arithmetic is the same non-negative
    integer ``div`` schedule, so labels are bit-identical to the
    distributed fixpoint (tests/test_pagerank.py drives both)."""
    out_deg: dict = {}
    for r in rows:
        out_deg[r[src_col]] = out_deg.get(r[src_col], 0) + 1
    endpoints = set(out_deg)
    for r in rows:
        endpoints.add(r[dst_col])
    ranks = {m: PAGERANK_ONE // n for m in endpoints}
    for _ in range(n_iter):
        sums: dict = {}
        for r in rows:
            u, v = r[src_col], r[dst_col]
            sums[v] = sums.get(v, 0) + ranks[u] // out_deg[u]
        ranks = {
            m: teleport + (damping_pct * sums.get(m, 0)) // 100
            for m in endpoints
        }
    default = PAGERANK_ONE // n if n_iter == 0 else teleport
    out = nodes.select(F.col(node_col).alias("node"))
    spark = nodes.sparkSession
    mapping = sorted(ranks.items())
    if not mapping:
        return out.withColumn(
            "rank_units", F.lit(default).cast("long")
        )
    schema = out.schema["node"].dataType.simpleString()
    if len(mapping) <= 10_000:
        from data_lake_spark.functions.localframe import values_df

        map_df = values_df(spark, mapping, f"node {schema}, __rank long")
    else:
        map_df = spark.createDataFrame(
            mapping, f"node {schema}, __rank long"
        )
    return out.join(F.broadcast(map_df), "node", "left").select(
        "node",
        F.coalesce("__rank", F.lit(default)).cast("long").alias("rank_units"),
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = 85,
    driver_max_edges: int = DRIVER_MAX_EDGES,
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list, exact by
    construction: ranks are integer fixed-point (:data:`PAGERANK_ONE`
    units), contributions are ``rank div out_degree``, damping is
    ``damping_pct * sum div 100`` — all integer ops, so the result is
    bit-identical on any partitioning, any engine, any cluster size
    (the functions/exact.py philosophy applied to an iterative
    algorithm). The deliberate cost: floor truncation loses ≤1 unit per
    edge per iteration (≤1e-12 of mass), irrelevant for ranking.

    Plan shape per iteration: ONE shuffle of the rank frame (join with
    the degree-annotated edge list on ``src``, then a map-side-
    combinable SUM by ``dst``), exactly the textbook distributed
    PageRank schedule. The edge list is materialized once with its out-
    degrees and reused every round; lineage is cut per round with
    localCheckpoint so the plan stays flat (the connected_components
    pattern). Dangling nodes (no out-edges) keep only the teleport
    term, matching the simple "no redistribution" PageRank variant —
    document the choice rather than hide it.

    nodes: one column ``node_col`` (include isolated nodes). Edges are
    taken as-is: PARALLEL edges count toward out-degree and contribute
    once each (pre-`.distinct()` the frame if multi-edges should not
    weight the link). Returns (node, rank_units) with SUM(rank) ≈
    PAGERANK_ONE (minus floor dust).
    """
    nodes = nodes.select(F.col(node_col).alias("node"))
    # N and the teleport constant are driver scalars — two longs, not data
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_units", F.lit(0).cast("long"))
    teleport = (PAGERANK_ONE * (100 - damping_pct)) // (100 * n)

    # adaptive placement (the connected_components convention): a
    # counted-small edge list iterates on the driver — rank state is
    # edge-endpoint-bounded, so this is model-state scale, not data
    # scale. One LIMIT(cap+1) probe doubles as the collect (≤ cap rows
    # back ⇒ the probe holds the whole list); ``driver_max_edges=0``
    # forces the distributed path.
    edges = edges.localCheckpoint(eager=False)
    probe = (
        edges.select(src_col, dst_col).limit(driver_max_edges + 1).collect()
    )
    if len(probe) <= driver_max_edges:
        return _driver_pagerank(
            nodes, probe, n_iter, node_col, src_col, dst_col,
            damping_pct, n, teleport,
        )

    deg = edges.groupBy(F.col(src_col).alias("u")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ed = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .join(deg, "u")
        .localCheckpoint(eager=False)  # reused every iteration
    )

    ranks = nodes.withColumn(
        "rank_units", F.lit(PAGERANK_ONE // n).cast("long")
    )
    for _ in range(n_iter):
        contrib = ed.join(ranks, ed.u == ranks.node).select(
            F.col("v").alias("node2"),
            F.expr("rank_units div out_deg").alias("c"),
        )
        sums = contrib.groupBy("node2").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, nodes.node == sums.node2, "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).cast("long").alias("rank_units"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the long-chain-safe alternative the min-label
    propagation in :func:`connected_components` documents: label
    propagation needs DIAMETER rounds (a 10k-node chain = 10k shuffles);
    the star alternation contracts the graph toward stars and converges
    in O(log n) rounds regardless of diameter, each round the same
    join+aggregate plan shape.

    large-star: every node hooks its LARGER neighbors onto the minimum
    of its neighborhood (incl. itself); small-star: canonicalize each
    edge under its larger endpoint and hook the smaller neighbors (and
    itself) onto that minimum. Both passes strictly never raise any
    node's smallest reachable label, and the fixpoint is a forest of
    stars rooted at component minima — identical labels to
    connected_components (the equivalence test proves it on cliques,
    chains, and random graphs).

    Deterministic (min over ids), lineage-cut per round; convergence is
    detected by an order-insensitive edge-set checksum (one aggregate
    per round, the functions/checksum.py recipe) instead of a
    subtract/count pass."""
    from data_lake_spark.functions.checksum import table_checksum

    out = nodes.select(F.col(node_col).alias("node"))
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _sym(df: DataFrame) -> DataFrame:
        return df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _large_star(df: DataFrame) -> DataFrame:
        sym = _sym(df)
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # canonicalize: group under the LARGER endpoint
        canon = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = canon.groupBy("u").agg(F.min("v").alias("m"))  # v < u always
        hooked = (
            canon.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        selfed = m.select(F.col("u"), F.col("m").alias("v"))
        return (
            hooked.union(selfed)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        sig = table_checksum(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )

    # fixpoint edges are (member, root) stars; roots + isolated nodes
    # label themselves. The min-agg is defensive: at the fixpoint each
    # member carries exactly one root edge, and min() keeps the label
    # well-defined even if that invariant ever loosened.
    labels = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("cluster_id")
    )
    return (
        out.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce("cluster_id", F.col("node")).alias("cluster_id"),
        )
    )
