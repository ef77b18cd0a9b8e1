"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The reference has no ML surface at all, but its north star
(BASELINE.json) asks for similarity-search infrastructure; IVF search
(operators/similarity.py ivf_search) needs trained cell centroids, and
Lloyd iterations are the standard trainer. Everything here is DataFrame
ops — explode → groupBy → broadcast join per iteration — so the same code
runs on 100 TB of vectors: per-dimension partial sums combine map-side,
centroids are k×dim rows (broadcastable by construction), and no step
ever materializes a pairwise distance matrix.

Determinism: centroid means use the floor-quantize→integer-sum recipe
(operators/similarity.py PSCALE, mirrored in the DuckDB oracle), so the
fitted centroids are identical across partitionings and engines — a
re-run on a different cluster size cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_lake_spark.operators.similarity import PSCALE, _to_double


def _elems(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col), F.posexplode(_to_double(vec_col)).alias("d", "x")
    )


def _exact_mean(col: str = "x") -> F.Column:
    return (
        F.sum(F.floor(F.col(col) * F.lit(PSCALE))).cast("double")
        / F.lit(PSCALE)
        / F.count(col)
    )


def assign_cells(elems: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid per vector by squared L2 (exact-quantized terms).

    ``centroids`` is (cell, d, c) — k×dim rows, broadcast so the join
    adds no shuffle on the vector side; the groupBy then combines
    map-side per (vector, cell)."""
    dists = (
        elems.join(F.broadcast(centroids), "d")
        .select(
            F.col(id_col),
            "cell",
            F.floor(
                (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")) * F.lit(PSCALE)
            ).alias("t"),
        )
        .groupBy(id_col, "cell")
        .agg(F.sum("t").alias("d2"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("cell").asc())
    return (
        dists.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, "cell", "d2")
    )


def lloyd_step(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """One Lloyd refinement from per-label seed centroids: seed = exact
    mean per ``label_col``, assign every vector to its nearest seed, then
    recompute the per-cell exact-mean centroids from the assignment.

    Returns (cell, d, centroid, n_members) — the refined codebook plus
    cluster sizes, ready to feed ivf_search or another step."""
    elems = _elems(emb, id_col, vec_col)
    seed_elems = emb.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode(_to_double(vec_col)).alias("d", "x"),
    )
    seeds = seed_elems.groupBy(label_col, "d").agg(_exact_mean().alias("c")).select(
        F.col(label_col).alias("cell"), "d", "c"
    )
    assigned = assign_cells(elems, seeds, id_col)
    return (
        elems.join(assigned.select(id_col, "cell"), id_col)
        .groupBy("cell", "d")
        .agg(_exact_mean().alias("centroid"), F.count("x").alias("n_members"))
    )


def hash_seeds(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Label-free deterministic seeding: rank vectors by md5(id) and
    take the first k as initial centroids (cell = rank). A hash order is
    a uniform sample that is identical on any cluster size — no rand(),
    no seed-state to ship. Returns (cell, d, c)."""
    w = Window.orderBy("h")
    picked = (
        emb.select(F.col(id_col))
        .withColumn("h", F.md5(F.col(id_col).cast("string")))
        .orderBy("h")
        .limit(k)
        .withColumn("cell", (F.row_number().over(w) - 1).cast("int"))
        .select(id_col, "cell")
    )
    return (
        _elems(emb, id_col, vec_col)
        .join(picked, id_col)
        .select("cell", "d", F.col("x").alias("c"))
    )


def kmeans_fit(
    emb: DataFrame,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    seeds: DataFrame | None = None,
    track_inertia: bool = True,
) -> tuple[DataFrame, list[float]]:
    """Full Lloyd loop: iterate assign → recompute ``n_iter`` times from
    the per-label seeds. Returns (centroids, inertia_per_iteration);
    inertia (sum of squared distances to the assigned centroid) is
    non-increasing — the classic convergence certificate. Seeds default
    to per-label exact means; pass ``seeds`` (e.g. :func:`hash_seeds`)
    for label-free corpora.

    Each iteration localCheckpoints the k×dim centroid frame: lineage
    stays constant-size instead of growing a join+agg per round (the
    iterative-algorithm pattern Spark needs — same as connected
    components in operators/textdedup)."""
    elems = _elems(emb, id_col, vec_col)
    if seeds is not None:
        centroids = seeds.localCheckpoint()
    else:
        seed_elems = emb.select(
            F.col(id_col),
            F.col(label_col),
            F.posexplode(_to_double(vec_col)).alias("d", "x"),
        )
        centroids = (
            seed_elems.groupBy(label_col, "d")
            .agg(_exact_mean().alias("c"))
            .select(F.col(label_col).alias("cell"), "d", "c")
            .localCheckpoint()
        )
    inertia: list[float] = []
    for _ in range(n_iter):
        assigned = assign_cells(elems, centroids, id_col)
        if track_inertia:
            # one scalar-agg job per round — the convergence certificate.
            # Skippable (track_inertia=False) when rounds are fixed: the
            # loop then launches exactly one job per recompute and no
            # driver round-trips beyond the checkpoints.
            inertia.append(
                assigned.agg(
                    (F.sum("d2").cast("double") / F.lit(PSCALE)).alias("i")
                ).collect()[0]["i"]
            )
        centroids = (
            elems.join(assigned.select(id_col, "cell"), id_col)
            .groupBy("cell", "d")
            .agg(_exact_mean().alias("c"))
            .localCheckpoint()
        )
    return centroids, inertia
