"""Feature-hashed document embeddings computed IN-ENGINE: text → a
16-dim signed bag-of-words vector (hashing trick, Weinberger et al.
2009) as one map-only higher-order-function expression — no model, no
UDF, no shuffle. Closes the text→vector→ANN loop for corpora that
arrive WITHOUT precomputed embeddings: the derived vectors feed the
same cosine/ANN/semantic-dedup operators as the embeddings table.

Per token t: bucket(t) = value of md5 hex digit 4 (uniform 0..15),
sign(t) = ±1 from the parity of hex digit 5 (independent digit);
v[j] = Σ_{tokens, bucket=j} sign — counts weight repeats naturally.
Exact integer folds → bit-identical across partitionings and engines.

Plan shape at 100 TB: embedding computation is embarrassingly parallel
projection work (the simhash pattern, generalized to a vector); the
top-k scan broadcasts the query docs and streams the corpus exactly
like similarity.cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.partitioning import shuffle_parallelism
from data_lake_spark.queries import QuerySpec

_DIM = 16
_HEX = "0123456789abcdef"

# token → (bucket, sign) memo, module-level so a reused Python worker
# (spark.python.worker.reuse, default on) keeps it across tasks (guide:
# heavyweight/per-token state once per worker, not per batch). Bounded:
# cleared when it outgrows broadcast scale.
_TOKEN_MEMO: dict = {}
_TOKEN_MEMO_CAP = 1_000_000


def _embed_arrow_batches(it):
    """One Arrow pass: texts → 16-dim signed bag-of-words vectors.

    Vectorized replacement for the higher-order-function fold (HOF
    lambdas evaluate interpreted, outside whole-stage codegen — the
    char_diversity regime note measured ~10× against one numpy pass at
    corpus-text element counts). Per DISTINCT token the md5 is computed
    once per worker (the JVM expression recomputes it per occurrence);
    per occurrence the work is one dict hit + one int add. Bucket/sign
    derivation is byte-identical to doc_embed_expr: hex digit 4 of
    md5(token) is the bucket, parity of hex digit 5 the sign."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    memo = _TOKEN_MEMO
    for batch in it:
        texts = batch.column(1).to_pylist()
        n = len(texts)
        out = np.zeros((n, _DIM), dtype=np.int64)
        for r, t in enumerate(texts):
            if t is None:
                continue
            row = out[r]
            for tok in t.split(" "):
                bs = memo.get(tok)
                if bs is None:
                    if len(memo) >= _TOKEN_MEMO_CAP:
                        memo.clear()
                    h = hashlib.md5(tok.encode("utf-8")).hexdigest()
                    bs = (int(h[3], 16), 1 if ord(h[4]) % 2 else -1)
                    memo[tok] = bs
                row[bs[0]] += bs[1]
        offsets = pa.array(
            np.arange(0, (n + 1) * _DIM, _DIM, dtype=np.int32)
        )
        emb = pa.ListArray.from_arrays(offsets, pa.array(out.ravel()))
        yield pa.RecordBatch.from_arrays(
            [batch.column(0), emb], names=["doc_id", "emb"]
        )


def doc_embed_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, emb array<long>): the hashed-embedding
    projection as ONE Arrow-batched kernel (map-only, zero exchanges of
    its own). Values are bit-identical to ``doc_embed_expr`` — exact
    integer folds both ways — so every consumer (doc_embed, doc_topk,
    rrf_fusion's semantic side) keeps its oracle unchanged."""
    return docs.select("doc_id", "text").mapInArrow(
        _embed_arrow_batches, schema="doc_id long, emb array<long>"
    )


def doc_embed_expr(text_col: str = "text", dim: int = _DIM) -> Column:
    """array<long> hashed embedding of a whitespace-tokenized text
    column — one row per document, zero shuffle. Lambda bodies get no
    common-subexpression elimination, so the md5 is computed ONCE per
    token in its own transform (the bucket and sign lambdas would
    otherwise each re-hash), and each token's (bucket, sign) pair is
    materialized once as a struct; the per-dimension fold then costs
    one int compare + add per token instead of re-running
    instr/substring/ascii over the md5 hex 16× per token (struct
    materialization measured ~3×, single-md5 on top of it ~1.3× on the
    sf0.1 corpus)."""
    hashes = F.transform(F.split(F.col(text_col), " "), lambda t: F.md5(t))
    bs = F.transform(
        hashes,
        lambda h: F.struct(
            (F.instr(F.lit(_HEX), F.substring(h, 4, 1)) - 1).alias("b"),
            F.when(F.ascii(F.substring(h, 5, 1)) % 2 == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        ),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            bs,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h["b"] == j, h["s"]).otherwise(F.lit(0)),
        ),
    )


def q_doc_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's 16-dim hashed embedding. The projection is
    map-only; one narrow (id, text) range exchange first spreads the
    token-hashing CPU across cores, because this corpus ships as a
    single parquet ROW GROUP — byte-range splits cannot cross it, so
    file-split parallelism is physically unavailable (see the note in
    session.py). On split-sized cluster files the exchange is free to
    drop. Sized from the session's shuffle width, not a literal — a
    hardcoded 32 was a local[32] tuning that would cap this stage at 32
    tasks on a real cluster.

    The vector is emitted as a comma-joined string, not array<long>:
    the driver's canonicalizer (pandas sort over every column) cannot
    order list cells — CORRECTNESS_r04 recorded exactly that TypeError.
    Downstream operators (doc_topk, semantic dedup) consume the array
    form via doc_embed_expr directly; the registry row is the
    driver-hashable projection of the same values."""
    docs = load_table(spark, sf_dir, "documents")
    # The output order (doc_id asc) is established on the narrow
    # (id, text) input via ONE range exchange — which doubles as the
    # CPU-spread the old round-robin repartition provided — and the
    # map-only Arrow kernel preserves it. The old shape (round-robin →
    # kernel → orderBy) paid a second exchange and re-ran the kernel
    # inside the range-sort sampling pass (r10 A/B: 1.20 s → 0.67 s at
    # sf0.1, rows and order bit-identical).
    return (
        doc_embed_arrays(
            docs.select("doc_id", "text")
            .repartitionByRange(shuffle_parallelism(spark), "doc_id")
            .sortWithinPartitions("doc_id")
        )
        .select(
            "doc_id",
            F.array_join(
                F.col("emb").cast("array<string>"), ","
            ).alias("embedding_csv"),
        )
    )


_SQL_TOK_EMBED = f"""
toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id,
         STRPOS('{_HEX}', SUBSTR(MD5(tok), 4, 1)) - 1 AS bucket,
         CASE WHEN ASCII(SUBSTR(MD5(tok), 5, 1)) % 2 = 1 THEN 1 ELSE -1 END AS sg
  FROM toks
),
sums AS (
  SELECT doc_id, bucket, SUM(sg) AS v FROM hashed GROUP BY 1, 2
),
dims AS (SELECT UNNEST(RANGE({_DIM})) AS dim),
dense AS (
  SELECT d.doc_id, dims.dim, COALESCE(s.v, 0) AS v
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN dims
  LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.bucket = dims.dim
),
vecs AS (
  SELECT doc_id, LIST(CAST(v AS BIGINT) ORDER BY dim) AS embedding
  FROM dense GROUP BY 1
)"""

ORACLE_DOC_EMBED = f"""
WITH {_SQL_TOK_EMBED}
SELECT doc_id, ARRAY_TO_STRING(embedding, ',') AS embedding_csv
FROM vecs ORDER BY doc_id
"""


def q_doc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-3 neighbors of the first 3 documents over the DERIVED
    hashed embeddings — the whole vector stack (embed + exact scan)
    with no embeddings table at all. Integer vectors make the quantized
    dot products exact by construction."""
    from data_lake_spark.operators.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    vecs = (
        doc_embed_arrays(
            docs.select("doc_id", "text").repartition(
                shuffle_parallelism(spark)
            )
        )
        .select("doc_id", F.col("emb").cast("array<double>").alias("v"))
        .localCheckpoint(eager=False)
    )
    q = vecs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = vecs.select(F.col("doc_id").alias("cand_id"), F.col("v").alias("cv"))
    return (
        cosine_topk(q, c, k=3)
        .select("query_id", "cand_id", "cosine", "rk")
        .orderBy("query_id", "rk")
    )


_PS = "1000000000000.0"

ORACLE_DOC_TOPK = f"""
WITH {_SQL_TOK_EMBED},
q AS (SELECT doc_id AS query_id, embedding AS qv FROM vecs WHERE doc_id < 3),
c AS (SELECT doc_id AS cand_id, embedding AS cv FROM vecs),
pelems AS (
  SELECT query_id, cand_id,
         CAST(UNNEST(qv) AS DOUBLE) AS qe,
         CAST(UNNEST(cv) AS DOUBLE) AS ce
  FROM q CROSS JOIN c WHERE query_id != cand_id
),
psums AS (
  SELECT query_id, cand_id,
         CAST(SUM(CAST(FLOOR(qe * ce * {_PS}) AS BIGINT)) AS DOUBLE) / {_PS} AS dot,
         CAST(SUM(CAST(FLOOR(qe * qe * {_PS}) AS BIGINT)) AS DOUBLE) / {_PS} AS qq,
         CAST(SUM(CAST(FLOOR(ce * ce * {_PS}) AS BIGINT)) AS DOUBLE) / {_PS} AS cc
  FROM pelems GROUP BY 1, 2
),
scored AS (
  SELECT query_id, cand_id, dot / (SQRT(qq) * SQRT(cc)) AS cosine FROM psums
)
SELECT query_id, cand_id, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id) AS BIGINT) AS rk
FROM scored
QUALIFY rk <= 3
ORDER BY query_id, rk
"""


REGISTRY: dict[str, QuerySpec] = {
    "doc_embed": QuerySpec(
        q_doc_embed,
        ORACLE_DOC_EMBED,
        "feature-hashed 16-dim document embeddings, map-only in-engine",
    ),
    "doc_topk": QuerySpec(
        q_doc_topk,
        ORACLE_DOC_TOPK,
        "cosine top-3 over the derived hashed embeddings (text-only "
        "corpus runs the full vector stack)",
    ),
}
