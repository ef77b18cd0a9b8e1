"""Weighted deterministic sampling — the token-budget curation sampler.

Uniform hash sampling (curation.q_hash_sample) keeps every document
with the same probability; a training-data budget usually wants
probability proportional to SIZE (long documents carry more tokens, so
subsampling them uniformly under-weights their token mass). This is the
deterministic analogue: keep probability p = min(1, n_chars / 4000),
decided by the same md5-u16 key — all arithmetic integer, so membership
is exact, engine-independent, and stable under corpus growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.queries import QuerySpec
from data_lake_spark.queries.curation import _oracle_u16, doc_u16

# p = min(1, n_chars / _FULL_KEEP_CHARS), evaluated in u16 integer space:
# keep iff u16(doc_id) < min(65536, n_chars * 65536 div _FULL_KEEP_CHARS)
_FULL_KEEP_CHARS = 4000


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli sample, reported per language: document
    and char counts, total vs sampled. The keep decision is a pure
    integer function of (doc_id, n_chars) — map-only scan, one dim-sized
    aggregate; no rand(), no seed plumbing, no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    # integer `div`, not floor(double /): both engines then compute the
    # identical exact integer quotient
    cut = F.least(
        F.lit(65536).cast("long"),
        F.expr(f"CAST(n_chars AS BIGINT) * 65536 div {_FULL_KEEP_CHARS}"),
    )
    keep = (doc_u16() < cut).cast("long")
    return (
        docs.withColumn("keep", keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            F.sum("keep").alias("docs_sampled"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(F.col("keep") * F.col("n_chars")).cast("long").alias(
                "chars_sampled"
            ),
        )
        .orderBy("lang")
    )


ORACLE_WEIGHTED_SAMPLE = f"""
WITH k AS (
  SELECT lang, n_chars,
         CASE WHEN {_oracle_u16('doc_id')} <
                   LEAST(65536, (CAST(n_chars AS BIGINT) * 65536) // {_FULL_KEEP_CHARS})
              THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT lang,
       COUNT(*) AS docs_total,
       CAST(SUM(keep) AS BIGINT) AS docs_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(keep * n_chars) AS BIGINT) AS chars_sampled
FROM k GROUP BY 1 ORDER BY 1
"""


REGISTRY: dict[str, QuerySpec] = {
    "weighted_sample": QuerySpec(
        q_weighted_sample,
        ORACLE_WEIGHTED_SAMPLE,
        "length-weighted deterministic Bernoulli sample per language",
    ),
}
