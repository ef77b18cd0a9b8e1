"""Training-data-pipeline queries, part 5: context-window chunking.

RAG ingestion and pretraining both slice documents into fixed-size token
windows with overlap so no boundary context is lost. Done wrong this is a
Python loop per document; done Spark-first it is a generated start-offset
sequence exploded per document with an array ``slice`` — Generate +
Project inside whole-stage codegen, no UDF, no shuffle until the final
presentation sort. The chunk count per document is
``ceil((n - overlap) / stride)``, so output grows linearly with corpus
tokens — the map-only shape that survives 100 TB.

Chunk text is compared as md5 (same bytes in both engines) to keep the
oracle hash small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.queries import QuerySpec

_CHUNK = 64  # tokens per window
_OVERLAP = 16  # tokens shared with the previous window
_STRIDE = _CHUNK - _OVERLAP


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunks per document: start offsets
    1, 1+stride, ... while start <= max(1, n - overlap); each chunk is
    ``slice(toks, start, CHUNK)`` (clamped at the tail). Every token is
    covered and consecutive chunks share exactly ``overlap`` tokens
    except the (possibly shorter) last one."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).withColumn("n", F.size("toks"))
    return (
        toks.select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.lit(1), F.col("n") - F.lit(_OVERLAP)),
                    F.lit(_STRIDE),
                )
            ).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / _STRIDE).cast("long").alias("chunk_id"),
            F.slice("toks", F.col("start"), F.lit(_CHUNK)).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("chunk").cast("long").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


ORACLE_CHUNK_DOCS = f"""
WITH t AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
s AS (
  SELECT doc_id, w,
         UNNEST(GENERATE_SERIES(1, GREATEST(1, LEN(w) - {_OVERLAP}),
                                {_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // {_STRIDE} AS BIGINT) AS chunk_id,
       CAST(LEN(LIST_SLICE(w, start, start + {_CHUNK} - 1)) AS BIGINT)
         AS n_tokens,
       MD5(ARRAY_TO_STRING(LIST_SLICE(w, start, start + {_CHUNK} - 1), ' '))
         AS chunk_hash
FROM s
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# embedding_quantize — int8 scalar quantization audit
# ---------------------------------------------------------------------------

_E9 = "1000000000.0"


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the 4×
    storage/bandwidth compression step before an ANN index ships to a
    cluster — audited per vector: symmetric scale (max |x|) and total
    reconstruction error. Entirely per-row higher-order array ops
    (transform/array_max/aggregate): a pure projection, ZERO shuffles at
    any corpus size; the only exchange is the presentation sort.

    Cross-engine determinism: all math in binary64 with the same
    expression tree, results integer-quantized via the FLOOR(x*1e9)
    recipe (functions/exact.py rationale) so Spark and DuckDB hash
    identically bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn(
            "v", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        )
        .withColumn("scale", F.expr("array_max(transform(v, x -> abs(x)))"))
        .select(
            "vec_id",
            F.size("v").cast("long").alias("n_dims"),
            F.expr(f"CAST(FLOOR(scale * {_E9}) AS BIGINT)").alias("scale_e9"),
            F.expr(
                "aggregate(v, CAST(0 AS BIGINT), (acc, x) -> acc + "
                "CAST(FLOOR(ABS(x - (CASE WHEN scale = 0 THEN 0.0 ELSE "
                "FLOOR(x / scale * 127 + 0.5) * scale / 127 END)) "
                f"* {_E9}) AS BIGINT))"
            ).alias("err_e9"),
        )
        .orderBy("vec_id")
    )


ORACLE_EMBEDDING_QUANTIZE = f"""
WITH t AS (
  SELECT vec_id,
         UNNEST(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) AS x,
         LEN(embedding) AS n_dims
  FROM embeddings
),
sc AS (
  SELECT vec_id, MAX(n_dims) AS n_dims, MAX(ABS(x)) AS scale
  FROM t GROUP BY 1
)
SELECT t.vec_id,
       CAST(sc.n_dims AS BIGINT) AS n_dims,
       CAST(FLOOR(sc.scale * {_E9}) AS BIGINT) AS scale_e9,
       CAST(SUM(CAST(FLOOR(ABS(x - (CASE WHEN sc.scale = 0 THEN 0.0 ELSE
              FLOOR(x / sc.scale * 127 + 0.5) * sc.scale / 127 END))
              * {_E9}) AS BIGINT)) AS BIGINT) AS err_e9
FROM t JOIN sc ON t.vec_id = sc.vec_id
GROUP BY t.vec_id, sc.n_dims, sc.scale
ORDER BY t.vec_id
"""


# ---------------------------------------------------------------------------
# stratified_sample — exactly-N-per-stratum deterministic sample
# ---------------------------------------------------------------------------

_PER_STRATUM = 20


def _stratified_rank(d: DataFrame) -> DataFrame:
    """Rank within language by (md5(doc_id), doc_id) and keep the top
    N — deterministic, content-independent, partitioning-independent."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _PER_STRATUM)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly N docs per language for eval-set carving. Rate-based
    sampling (hash_sample / mixture_weights) can't promise exact counts;
    this does.

    Scale shape: a naive per-stratum row_number funnels the WHOLE corpus
    through as many reducers as there are languages — a single-reducer
    choke with 5 strata at 100 TB. So phase 1 pre-filters map-only to the
    rows whose md5-prefix fraction is within 8N/count of the stratum
    (expected ~8N survivors each; counts come from one map-side-combinable
    agg), and only survivors — thousands of rows, not the corpus — are
    ranked. Because the prefix fraction is monotone in the md5 sort
    order, survivors containing >= min(N, n) rows per stratum guarantee
    the result is IDENTICAL to ranking everything; that invariant is
    checked pre-flight and the corpus-wide ranking is the (practically
    unreachable, p < 1e-40) fallback."""
    d = load_table(spark, sf_dir, "documents")
    hexlen = 15
    frac = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, hexlen),
            16,
            10,
        ).cast("decimal(20,0)")
        / F.lit(16**hexlen)
    ).cast("double")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    keep = F.least(F.lit(1.0), F.lit(8.0 * _PER_STRATUM) / F.col("__n"))
    survivors = (
        d.withColumn("__frac", frac)
        .join(F.broadcast(counts.withColumn("__keep", keep)), "lang")
        .filter(F.col("__frac") <= F.col("__keep"))
    )
    ok = (
        survivors.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__s"), F.first("__n").alias("__n"))
        .filter(F.col("__s") < F.least(F.lit(_PER_STRATUM), F.col("__n")))
        .count()
        == 0
    )
    if not ok:  # pragma: no cover - p < 1e-40 with the 8x margin
        return _stratified_rank(d)
    return _stratified_rank(survivors.select("doc_id", "lang"))


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
) WHERE rk <= {_PER_STRATUM}
ORDER BY lang, rk
"""


REGISTRY: dict[str, QuerySpec] = {
    "chunk_docs": QuerySpec(
        q_chunk_docs, ORACLE_CHUNK_DOCS,
        "overlapping context-window chunking (64-token windows, 16 overlap)",
    ),
    "stratified_sample": QuerySpec(
        q_stratified_sample, ORACLE_STRATIFIED_SAMPLE,
        "exactly-N-per-language deterministic hash-ordered sample",
    ),
    "embedding_quantize": QuerySpec(
        q_embedding_quantize, ORACLE_EMBEDDING_QUANTIZE,
        "int8 scalar-quantization audit per embedding (zero-shuffle)",
    ),
}
