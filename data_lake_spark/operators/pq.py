"""Product quantization (PQ) for embedding compression + ADC search.

The missing tier between exact scan and IVF probing (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011): split
each vector into ``m`` subvectors, learn a tiny per-subspace codebook
(``k`` centroids), and store each vector as ``m`` small codes. At 100 TB
this is the difference between scanning raw vectors (64 dims × 4 B =
256 B/vector) and scanning codes (m = 4 B/vector): a ~64× smaller scan
that is memory-bandwidth-, not compute-, bound.

Search uses asymmetric distance computation (ADC): per query, build a
lookup table LUT[s][c] = <query_sub(s), centroid(s, c)> (m×k entries —
dim-sized, broadcastable), then every candidate's approximate dot
product is a sum of m table lookups. In Spark that is an equi-join of
the codes table against the broadcast LUT on (subspace, code) followed
by a map-side-combinable sum — no shuffle of the raw vectors at all.
Compose with IVF cells (operators/similarity.py ivf_search) for IVF-PQ
when even the code scan must be pruned.

Determinism: codebook "training" is one deterministic k-means step —
seed assignment by md5 parity of (vec_id, subspace) (the same
engine-independent hash family as srp_bucket_expr), then exact
quantized means — so codebooks, codes, and ADC scores are bit-identical
across partitionings and reproducible in the DuckDB oracle
(queries/llm7.py) with the same arithmetic.

Reference parity: the reference has no ANN surface at all; this extends
the engine for the LLM-training-data workload (SURVEY §8) alongside
srp/ivf in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lake_spark.operators.similarity import PSCALE, _to_double, _vec_dim


def _seed_code(id_col: Column, s_col: Column, k: int) -> Column:
    """Deterministic initial code: md5-hex-parity of "id:s" mod k — the
    fixed engine-independent hash family used across the repo (biased
    for k not a power of 16, but seeding only needs spread, not
    uniformity)."""
    return (
        F.ascii(
            F.substring(
                F.md5(
                    F.concat(
                        id_col.cast("string"), F.lit(":"), s_col.cast("string")
                    )
                ),
                1,
                1,
            )
        )
        % k
    )


def pq_elems(
    emb: DataFrame, m: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, s, d, x) element rows with subspace index s = d div (dim/m).
    One posexplode — the same uniform-key shuffle shape as ivf_assign."""
    dim = _vec_dim(emb, vec_col)
    subdim = dim // m
    return emb.select(
        F.col(id_col), F.posexplode(_to_double(vec_col)).alias("d", "x")
    ).withColumn("s", (F.col("d") / F.lit(subdim)).cast("int"))


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(s, code, d, c): per-subspace centroids from one deterministic
    k-means step — md5-parity seed assignment, exact quantized means.
    Output is m×k×dim rows (dim-sized): always broadcastable."""
    elems = pq_elems(emb, m, id_col, vec_col).withColumn(
        "code", _seed_code(F.col(id_col), F.col("s"), k)
    )
    return elems.groupBy("s", "code", "d").agg(
        (
            F.sum(F.floor(F.col("x") * F.lit(PSCALE))).cast("double")
            / F.lit(PSCALE)
            / F.count("x")
        ).alias("c")
    )


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, s, code): nearest centroid per subspace by quantized squared
    L2 (ties → smallest code). Broadcast-join elements against the
    dim-sized codebook, two map-side-combinable aggregations — the
    corpus shuffles only (id, s, code, d2) rows, never raw vectors
    against each other."""
    elems = pq_elems(emb, m, id_col, vec_col)
    d2 = (
        elems.join(F.broadcast(codebooks), ["s", "d"])
        .select(
            F.col(id_col),
            "s",
            "code",
            F.floor(
                (F.col("x") - F.col("c"))
                * (F.col("x") - F.col("c"))
                * F.lit(PSCALE)
            ).alias("t"),
        )
        .groupBy(id_col, "s", "code")
        .agg(F.sum("t").alias("d2"))
    )
    # argmin via min-of-struct: orders by d2 then code, so ties break to
    # the smallest code — no window needed, stays a hash aggregate
    return (
        d2.groupBy(id_col, "s")
        .agg(F.min(F.struct("d2", "code")).alias("best"))
        .select(F.col(id_col), "s", F.col("best.code").alias("code"))
    )


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_top: int = 5,
    m: int = 4,
    k_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC linear scan: approximate dot(query, candidate) as the sum
    of m LUT lookups; top-``k_top`` per query by approx score.

    Plan shape: codebooks materialize once (localCheckpoint) and feed
    both the corpus encode and the per-query LUT; the scan itself is
    codes ⋈ broadcast(LUT) on (s, code) + a hash aggregate on
    (query_id, cand_id) — the raw embedding column is read once to
    encode and never joined pairwise. approx_dot is deterministic
    (quantized means + quantized LUT terms, exact integer sums)."""
    cb = pq_codebooks(emb, m, k_codes, id_col, vec_col).localCheckpoint(
        eager=False
    )
    codes = pq_encode(emb, cb, m, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"), "s", "code"
    )
    q_elems = pq_elems(emb, m, id_col, vec_col).filter(
        F.col(id_col).isin(query_ids)
    )
    lut = (
        q_elems.join(F.broadcast(cb), ["s", "d"])
        .select(
            F.col(id_col).alias("query_id"),
            "s",
            "code",
            F.floor(F.col("x") * F.col("c") * F.lit(PSCALE)).alias("t"),
        )
        .groupBy("query_id", "s", "code")
        .agg(F.sum("t").alias("lut"))
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .groupBy("query_id", "cand_id")
        .agg((F.sum("lut").cast("double") / F.lit(PSCALE)).alias("approx_dot"))
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("cand_id")
    )
    return scored.withColumn(
        "rk", F.row_number().over(w).cast("long")
    ).filter(F.col("rk") <= k_top)


def pq_adc_rerank_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_top: int = 5,
    shortlist: int = 100,
    m: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production two-stage shape: PQ-ADC scan prunes the corpus to
    a per-query ``shortlist``, then exact cosine re-ranks ONLY the
    shortlist. The expensive raw-vector math touches Q×shortlist rows
    instead of Q×N; the N-sized pass reads only the 64×-compressed
    codes. Final recall equals the shortlist's containment of the true
    top-k — tune ``shortlist``/``m``/``k_codes`` for the recall-cost
    point (random vectors are PQ's worst case; clustered real
    embeddings recall far higher at the same settings)."""
    from data_lake_spark.operators.similarity import dot_exact, norm_exact

    short = pq_adc_topk(
        emb, query_ids, k_top=shortlist, m=m, k_codes=k_codes, id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "cand_id")
    vecs = emb.select(
        F.col(id_col), _to_double(vec_col).alias("v")
    ).withColumn("nrm", norm_exact("v"))
    q = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        short.join(F.broadcast(q), "query_id")
        .join(
            vecs.select(
                F.col(id_col).alias("cand_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cn"),
            ),
            "cand_id",
        )
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        (dot_exact("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return scored.withColumn(
        "rk", F.row_number().over(w).cast("long")
    ).filter(F.col("rk") <= k_top)
