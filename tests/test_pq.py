"""Product quantization: encode invariants, ADC determinism across
partitionings, and approximation quality vs the exact scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.pq import pq_adc_topk, pq_codebooks, pq_encode
from data_lake_spark.operators.similarity import _to_double, cosine_topk

_QUERIES = [0, 1, 2, 3, 4]
_M, _K = 4, 8


def test_encode_complete_and_in_range(spark, sf_dir):
    """Every vector gets exactly one code per subspace, all in [0, k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    cb = pq_codebooks(emb, m=_M, k=_K)
    codes = pq_encode(emb, cb, m=_M)
    assert codes.count() == n_vecs * _M
    assert codes.select("vec_id", "s").distinct().count() == n_vecs * _M
    bad = codes.filter((F.col("code") < 0) | (F.col("code") >= _K)).count()
    assert bad == 0


def test_codebook_is_dim_sized(spark, sf_dir):
    """The codebook is m*k*dim rows regardless of corpus size — the
    broadcastability contract the ADC join relies on."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    cb = pq_codebooks(emb, m=_M, k=_K)
    # seeded groups may miss some (s, code) combos on tiny corpora, so
    # <=; each present (s, code) covers its full subdim of dimensions
    assert cb.count() <= _M * _K * dim
    per_group = cb.groupBy("s", "code").count().select("count").distinct()
    assert [r["count"] for r in per_group.collect()] == [dim // _M]


def test_map_only_encode_matches_groupby_encode(spark, sf_dir):
    """The literal-codebook higher-order-function encode (zero shuffle)
    must produce bit-identical codes to the groupBy/join formulation —
    same floor-quantized distances, same tie-breaks."""
    from data_lake_spark.operators.pq import (
        pq_codebook_lit,
        pq_encode_map_only,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb, m=_M, k=_K)
    a = {
        (r.vec_id, r.s, r.code)
        for r in pq_encode(emb, cb, m=_M).collect()
    }
    values, present, subdim = pq_codebook_lit(emb, m=_M, k=_K)
    b = {
        (r.vec_id, r.s, r.code)
        for r in pq_encode_map_only(emb, values, present, subdim).collect()
    }
    assert a == b


def test_adc_deterministic_across_partitionings(spark, sf_dir):
    """Quantized sums are exact and associative: scores must be
    bit-identical at 1 partition and 32."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = pq_adc_topk(emb.coalesce(1), _QUERIES, k_top=5, m=_M, k_codes=_K)
    b = pq_adc_topk(emb.repartition(32), _QUERIES, k_top=5, m=_M, k_codes=_K)
    ra = {(r.query_id, r.cand_id, r.approx_dot, r.rk) for r in a.collect()}
    rb = {(r.query_id, r.cand_id, r.approx_dot, r.rk) for r in b.collect()}
    assert ra == rb


def test_rerank_recall(spark, sf_dir):
    """Two-stage PQ (ADC shortlist + exact re-rank) must recover a
    large share of the exact top-10 and dominate the plain ADC ranking.
    The corpus is near-random vectors — PQ's worst case (random
    recall@10 over 500 candidates ≈ 0.02); clustered real embeddings
    recall far higher at the same settings."""
    from data_lake_spark.operators.pq import pq_adc_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(_QUERIES)).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"), _to_double("embedding").alias("cv")
    )
    truth = {(r.query_id, r.cand_id) for r in cosine_topk(q, c, k=10).collect()}
    adc = {
        (r.query_id, r.cand_id)
        for r in pq_adc_topk(emb, _QUERIES, k_top=10, m=8, k_codes=16).collect()
    }
    rr = {
        (r.query_id, r.cand_id)
        for r in pq_adc_rerank_topk(
            emb, _QUERIES, k_top=10, shortlist=100, m=8, k_codes=16
        ).collect()
    }
    recall_adc = len(adc & truth) / len(truth)
    recall_rr = len(rr & truth) / len(truth)
    assert recall_rr >= recall_adc
    assert recall_rr >= 0.4, f"rerank recall@10 {recall_rr}"
