"""LLM-training-data-pipeline queries over ``documents`` / ``embeddings``.

These go beyond the reference's own surface (BASELINE.json north_star):
text analysis, language-ID, document fingerprinting, exact + near
deduplication, and similarity search — each designed shuffle-friendly for
100 TB (explode→groupBy map-side combinable; candidate generation via
equi-joins on shingle/band/bucket keys, never a cross join on the full
corpus) and each paired with a bit-identical DuckDB oracle.

Float determinism uses the same decimal-exact-sum recipe as
``functions.exact``; string hashing uses md5 (identical hex in both
engines); min/argmax over hex strings is plain lexicographic order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.queries import QuerySpec

_STOPWORDS = ("the", "a", "of", "and", "to")
_SW_SQL = "('the', 'a', 'of', 'and', 'to')"


def _toks(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics: token count (whitespace tokenizer),
    char count, mean token length, stopword ratio, and a deterministic
    quality score — the length/stopword heuristics used to filter LLM
    training corpora. All built-in expressions; no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return (
        docs.select(
            "doc_id",
            "lang",
            F.length("text").alias("n_chars"),
            n_tokens.cast("long").alias("n_tokens"),
            (F.length("text") * 1.0 / n_tokens).alias("avg_token_len"),
            (n_stop * 1.0 / n_tokens).alias("stopword_ratio"),
            (
                F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5
                + (n_stop * 1.0 / n_tokens) * 0.5
            ).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


ORACLE_TEXT_STATS = f"""
SELECT doc_id, lang,
       LENGTH(text) AS n_chars,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
       LENGTH(text) * 1.0 / LEN(STRING_SPLIT(text, ' ')) AS avg_token_len,
       LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN {_SW_SQL})) * 1.0
         / LEN(STRING_SPLIT(text, ' ')) AS stopword_ratio,
       LEAST(LEN(STRING_SPLIT(text, ' ')) / 100.0, 1.0) * 0.5
         + (LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN {_SW_SQL})) * 1.0
            / LEN(STRING_SPLIT(text, ' '))) * 0.5 AS quality_score
FROM documents ORDER BY 1
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID: score = occurrence counts of
    language-marker substrings (the classic stopword-profile detector,
    here with 3 profiles), predicted = argmax with a fixed tie order.
    occurrences(s, p) = (len(s) - len(replace(s, p, ''))) / len(p) — pure
    built-ins, identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")

    def occ(p: str) -> F.Column:
        return (F.length("text") - F.length(F.replace(F.col("text"), F.lit(p)))) / len(p)

    s_en = (occ(" the ") + occ(" and ")).alias("score_en")
    s_es = (occ(" el ") + occ(" la ")).alias("score_es")
    s_fr = (occ(" le ") + occ(" et ")).alias("score_fr")
    scored = docs.select("doc_id", "lang", s_en, s_es, s_fr)
    return (
        scored.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            "score_en",
            "score_es",
            "score_fr",
            F.when(
                (F.col("score_en") >= F.col("score_es"))
                & (F.col("score_en") >= F.col("score_fr")),
                "en",
            )
            .when(F.col("score_es") >= F.col("score_fr"), "es")
            .otherwise("fr")
            .alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


def _occ_sql(p: str) -> str:
    return f"(LENGTH(text) - LENGTH(REPLACE(text, '{p}', ''))) / {len(p)}"


ORACLE_LANG_ID = f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         {_occ_sql(' the ')} + {_occ_sql(' and ')} AS score_en,
         {_occ_sql(' el ')} + {_occ_sql(' la ')} AS score_es,
         {_occ_sql(' le ')} + {_occ_sql(' et ')} AS score_fr
  FROM documents
)
SELECT doc_id, labeled_lang, score_en, score_es, score_fr,
       CASE WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END AS predicted_lang
FROM scored ORDER BY 1
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (D2-style content-only dedup, reference
    bronze_ingest_users_mock.py:79-80, generalized to the hash-groupBy used
    on web-scale corpora): md5(lower(text)) → keep lowest doc_id. The
    groupBy is map-side combinable; the hash key shards uniformly, so no
    skew at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.col("text"))).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("keeper_doc_id")
    )


ORACLE_EXACT_DEDUP = """
SELECT MD5(LOWER(text)) AS content_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 2
"""


def q_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup candidate pairs: distinct word-3-gram
    shingles per doc, equi-join on shingle (the scale path: candidates come
    from an inverted-index join, NOT a pairwise cross join), Jaccard =
    |∩| / (|A|+|B|-|∩|) from exact integer counts. Restricted to a doc_id
    window so pair volume stays bounded in the gate; the plan shape is the
    100 TB one."""
    from data_lake_spark.operators.textdedup import jaccard_pairs, shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    return (
        jaccard_pairs(shingles(docs, n=3), min_jaccard=0.01)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


ORACLE_SHINGLE_PAIRS = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(STRING_SPLIT(text, ' ')) AS tok,
         GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
  FROM documents WHERE doc_id < 80
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE shingle IS NOT NULL
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.01
ORDER BY 1, 2
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint (16-bit variant): per DISTINCT token,
    md5 hex chars 1..16 each vote ±1 on one bit (odd char code → +1);
    bit set if the vote sum is positive; fingerprint = Σ bit_b·2^b.
    Near-dup docs differ in few bits. Computed MAP-ONLY via the
    higher-order-function expression (operators/textdedup.simhash16_expr)
    — one row per doc, zero shuffle; the exact integer vote folds make
    it bit-identical to the explode→groupBy formulation the oracle
    mirrors."""
    from data_lake_spark.operators.partitioning import shuffle_parallelism
    from data_lake_spark.operators.textdedup import simhash16_expr

    docs = load_table(spark, sf_dir, "documents")
    # Output order (doc_id asc) is established on the narrow (id, text)
    # input — repartitionByRange samples two cheap columns — and the
    # map-only fold preserves it, so the interpreted HOF work (the
    # expensive part) spreads across cores AND is computed once. The
    # old shape (fold → orderBy) ran the fold single-task and a second
    # time inside the range-sort sampling pass (r10 A/B: 1.43 s →
    # 0.45 s at sf0.1, rows and order bit-identical).
    return (
        docs.select("doc_id", "text")
        .repartitionByRange(shuffle_parallelism(spark), "doc_id")
        .sortWithinPartitions("doc_id")
        .select("doc_id", simhash16_expr("text").alias("simhash16"))
    )


ORACLE_SIMHASH = """
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
  )
),
bits AS (
  SELECT doc_id,
         GENERATE_SUBSCRIPTS(STRING_SPLIT(SUBSTR(MD5(tok), 1, 16), ''), 1) - 1 AS bit,
         CASE WHEN ASCII(UNNEST(STRING_SPLIT(SUBSTR(MD5(tok), 1, 16), ''))) % 2 = 1
              THEN 1 ELSE -1 END AS vote
  FROM toks
),
votes AS (SELECT doc_id, bit, SUM(vote) AS v FROM bits GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0 THEN CAST(POW(2.0, bit) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash16
FROM votes GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

# dot-product quantization: floor(product * 1e12) — see functions/exact.py
_PSCALE = "1000000000000.0"


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k — the exact baseline every ANN variant is
    measured against. Queries = vec_id < 5; candidates = the full corpus.
    Per-element products are IEEE doubles (deterministic), quantized with
    floor at 1e-12 and summed as exact longs (order-independent), cosine
    assembled in double, top-10 per query by (score desc, vec_id). The
    candidate side streams — no shuffle of the corpus; the tiny query set
    broadcasts."""
    from data_lake_spark.operators.similarity import _to_double, cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), _to_double("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), _to_double("embedding").alias("cv"))
    return cosine_topk(q, c, k=10).orderBy("query_id", "rk")


ORACLE_COSINE_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
elems AS (
  SELECT query_id, cand_id,
         CAST(UNNEST(qv) AS DOUBLE) AS qe,
         CAST(UNNEST(cv) AS DOUBLE) AS ce
  FROM q CROSS JOIN c WHERE query_id != cand_id
),
sums AS (
  SELECT query_id, cand_id,
         CAST(SUM(CAST(FLOOR(qe * ce * {_PSCALE}) AS BIGINT)) AS DOUBLE) / {_PSCALE} AS dot,
         CAST(SUM(CAST(FLOOR(qe * qe * {_PSCALE}) AS BIGINT)) AS DOUBLE) / {_PSCALE} AS qq,
         CAST(SUM(CAST(FLOOR(ce * ce * {_PSCALE}) AS BIGINT)) AS DOUBLE) / {_PSCALE} AS cc
  FROM elems GROUP BY 1, 2
),
scored AS (
  SELECT query_id, cand_id, dot / (SQRT(qq) * SQRT(cc)) AS cosine FROM sums
)
SELECT query_id, cand_id, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id) AS BIGINT) AS rk
FROM scored
QUALIFY rk <= 10
ORDER BY query_id, rk
"""


REGISTRY: dict[str, QuerySpec] = {
    "text_stats": QuerySpec(q_text_stats, ORACLE_TEXT_STATS, "token/char/stopword/quality"),
    "lang_id": QuerySpec(q_lang_id, ORACLE_LANG_ID, "n-gram heuristic language ID"),
    "exact_dedup": QuerySpec(q_exact_dedup, ORACLE_EXACT_DEDUP, "hash-groupBy exact dedup"),
    "shingle_pairs": QuerySpec(q_shingle_pairs, ORACLE_SHINGLE_PAIRS, "n-gram Jaccard near-dup"),
    "simhash": QuerySpec(q_simhash, ORACLE_SIMHASH, "SimHash fingerprint"),
    "cosine_topk": QuerySpec(q_cosine_topk, ORACLE_COSINE_TOPK, "brute-force ANN baseline"),
}
