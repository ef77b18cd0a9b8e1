"""ANN quality: multi-probe recall must dominate single-probe recall
against the exact brute-force ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.similarity import (
    _to_double,
    ann_topk_bucketed,
    ann_topk_multiprobe,
    cosine_topk,
)

_QUERIES = [0, 1, 2, 3, 4]


def _pairs(df) -> set:
    return {(r.query_id, r.cand_id) for r in df.collect()}


def test_multiprobe_recall_dominates(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(_QUERIES)).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), _to_double("embedding").alias("cv"))
    truth = _pairs(cosine_topk(q, c, k=3))
    single = _pairs(ann_topk_bucketed(emb, _QUERIES, k=3))
    multi = _pairs(ann_topk_multiprobe(emb, _QUERIES, k=3))
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi >= recall_single
    # multi-probe candidates are a superset of single-probe's (flip=0 term)
    assert single <= multi or recall_multi >= recall_single


def test_srp_literal_weights_match_expression_form(spark, sf_dir):
    """The literal-weights bucket expression must bucket every vector
    identically to the dim-agnostic in-engine md5 form (same hash
    family, precomputed) — the two formulations are interchangeable."""
    from pyspark.sql import functions as F

    from data_lake_spark.catalog import load_table
    from data_lake_spark.operators.similarity import (
        srp_bucket_expr,
        srp_bucket_expr_lit,
        _vec_dim,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = _vec_dim(emb, "embedding")
    n_diff = (
        emb.select(
            srp_bucket_expr("embedding", 8).alias("a"),
            srp_bucket_expr_lit("embedding", 8, dim).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert n_diff == 0


def test_semantic_dedup_cap_is_sound(spark):
    """Sub-split blocking only removes candidate pairs: capped drops
    must be a SUBSET of the exact query's drops, and a cap larger than
    every cell must reproduce the exact result identically."""
    import os

    from pyspark.sql import functions as F

    from data_lake_spark.catalog import load_table
    from data_lake_spark.operators.similarity import (
        ivf_centroids,
        semantic_dedup,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = load_table(spark, sf, "embeddings")
    cent = ivf_centroids(emb).localCheckpoint()

    def drops(max_cell):
        out = semantic_dedup(emb, cent, tau=0.30, max_cell=max_cell)
        return {r.vec_id for r in out.filter(F.col("dropped")).collect()}

    exact = drops(None)
    capped = drops(16)
    assert capped <= exact
    assert drops(10**9) == exact  # cap beyond every cell = exact


def test_semantic_dedup_stale_centroids_keep_all_rows(spark):
    """A centroids artifact missing some cells (stale/subset-trained)
    must not erase those cells' vectors from the output: every vector
    keeps its row, unjudgeable ones get null cos_cent and are neither
    dropped nor cause drops."""
    import os

    from pyspark.sql import functions as F

    from data_lake_spark.catalog import load_table
    from data_lake_spark.operators.similarity import (
        ivf_centroids,
        semantic_dedup,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = load_table(spark, sf, "embeddings")
    some_cell = emb.select("label").first().label
    stale = ivf_centroids(emb).filter(F.col("cell") != some_cell)
    out = semantic_dedup(emb, stale.localCheckpoint()).localCheckpoint()
    assert out.count() == emb.count()  # one row per vector, none vanish
    orphans = out.filter(F.col("cell") == some_cell)
    assert orphans.count() == emb.filter(F.col("label") == some_cell).count()
    assert orphans.filter(F.col("cos_cent").isNotNull()).count() == 0
    assert orphans.filter(F.col("dropped")).count() == 0
