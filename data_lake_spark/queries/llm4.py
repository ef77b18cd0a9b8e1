"""Training-data-pipeline queries, part 4: sequence packing, PII
redaction, TF-IDF term ranking, and a k-means Lloyd refinement — each
with a bit-identical DuckDB oracle.

Beyond the reference surface (north-star extensions per BASELINE.json).
Scale notes baked into each plan:
- packing is one window pass partitioned by language — running-sum state
  only, no global sort (operators/packing.py);
- redaction is a per-row regex projection in whole-stage codegen
  (operators/redact.py) — one scan at 100 TB;
- TF-IDF is two map-side-combinable aggregations joined on the token —
  the df side is vocabulary-sized, so the join broadcasts;
- the Lloyd step is explode → groupBy → broadcast-join per iteration
  (operators/kmeans.py) — centroids stay k×dim rows, never a pairwise
  distance matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.kmeans import lloyd_step
from data_lake_spark.operators.packing import pack_sequences
from data_lake_spark.operators.redact import PII_PATTERNS, redact_pii
from data_lake_spark.queries import QuerySpec

_PS = "1000000000000.0"
_BUDGET = 2048


# ---------------------------------------------------------------------------
# seq_pack — contiguous-fill sequence packing per language
# ---------------------------------------------------------------------------


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each language's documents (doc_id order, whitespace token
    counts) into 2048-token training sequences by start offset, then
    report per-sequence fill: how many documents, how many tokens, and
    the id span. The reference has no training surface; this is the
    pretraining-side twin of its gold-zone rollups."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(
        docs, budget=_BUDGET, group_cols=["lang"], order_cols=["doc_id"]
    )
    return (
        packed.groupBy("lang", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "seq_id")
    )


ORACLE_SEQ_PACK = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT lang, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_off
  FROM t
)
SELECT lang, start_off // {_BUDGET} AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# pack_efficiency — the packing DECISION table (seq_pack's rollup)
# ---------------------------------------------------------------------------


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language packing efficiency audit — the numbers that decide
    whether the 2048-token budget is right for this corpus: sequence
    count, boundary-SPLIT documents (a doc spanning two sequences
    leaks cross-document attention unless masked — the count is the
    masking workload), padding waste in the final sequence, and the
    integer-exact fill rate (ppm). Same one-window plan as seq_pack
    (per-group running sum, one exchange) plus a language-sized
    rollup; integer arithmetic throughout so any engine agrees."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(
        docs, budget=_BUDGET, group_cols=["lang"], order_cols=["doc_id"]
    ).select(
        "lang",
        "n_tokens",
        F.expr(f"start_off DIV {_BUDGET}").alias("first_seq"),
        F.expr(f"(start_off + n_tokens - 1) DIV {_BUDGET}").alias(
            "last_seq"
        ),
    )
    return (
        packed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.max("last_seq") + F.lit(1)).cast("long").alias("n_seqs"),
            F.sum(
                (F.col("last_seq") > F.col("first_seq")).cast("long")
            ).alias("n_split_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_seqs",
            "n_split_docs",
            "total_tokens",
            (F.col("n_seqs") * F.lit(_BUDGET) - F.col("total_tokens"))
            .cast("long")
            .alias("waste_tokens"),
            F.expr(
                f"total_tokens * 1000000 DIV (n_seqs * {_BUDGET})"
            ).alias("fill_ppm"),
        )
        .orderBy("lang")
    )


ORACLE_PACK_EFFICIENCY = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_off
  FROM t
),
d AS (
  SELECT lang, n_tokens,
         start_off // {_BUDGET} AS first_seq,
         (start_off + n_tokens - 1) // {_BUDGET} AS last_seq
  FROM packed
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(MAX(last_seq) + 1 AS BIGINT) AS n_seqs,
       CAST(SUM(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
            AS BIGINT) AS n_split_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((MAX(last_seq) + 1) * {_BUDGET} - SUM(n_tokens)
            AS BIGINT) AS waste_tokens,
       CAST(SUM(n_tokens) * 1000000 // ((MAX(last_seq) + 1) * {_BUDGET})
            AS BIGINT) AS fill_ppm
FROM d GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# pii_redact — regex scrub with audit counts
# ---------------------------------------------------------------------------


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/redact.py) demonstrated end-to-end: the
    corpus text is deterministically salted with synthetic PII (an email,
    an IP, a phone derived from doc_id — the testdata itself contains
    none), then redacted; output is the audit counts plus the md5 of the
    scrubbed text, so the oracle checks every replaced byte."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(".7 call 555-"),
            (1000 + F.col("doc_id") % 1000).cast("string"),
            F.lit(" "),
            F.col("text"),
        ).alias("text"),
    )
    red = redact_pii(docs, "text")
    return red.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.length("redacted").cast("long").alias("red_len"),
        F.md5("redacted").alias("red_md5"),
    ).orderBy("doc_id")


_EMAIL_PAT, _EMAIL_REPL = PII_PATTERNS["email"]
_IP_PAT, _IP_REPL = PII_PATTERNS["ipv4"]
_PHONE_PAT, _PHONE_REPL = PII_PATTERNS["phone"]

ORACLE_PII_REDACT = f"""
WITH salted AS (
  SELECT doc_id,
         'u' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.'
             || CAST(doc_id % 250 AS VARCHAR) || '.7 call 555-'
             || CAST(1000 + doc_id % 1000 AS VARCHAR) || ' ' || text AS text
  FROM documents
),
red AS (
  SELECT doc_id,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_EMAIL_PAT}')) AS BIGINT) AS n_email,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_IP_PAT}')) AS BIGINT) AS n_ipv4,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_PHONE_PAT}')) AS BIGINT) AS n_phone,
         REGEXP_REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(text, '{_EMAIL_PAT}', '{_EMAIL_REPL}', 'g'),
             '{_IP_PAT}', '{_IP_REPL}', 'g'),
           '{_PHONE_PAT}', '{_PHONE_REPL}', 'g') AS redacted
  FROM salted
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       CAST(LENGTH(redacted) AS BIGINT) AS red_len,
       MD5(redacted) AS red_md5
FROM red ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# tfidf_topterms — per-document characteristic terms
# ---------------------------------------------------------------------------


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by a TF-IDF-style integer
    score: ``tf * 1e6 div df`` (monotone in tf/idf, exact in integers so
    both engines rank identically — no float log). The document-frequency
    table is vocabulary-sized and broadcast; term counting combines
    map-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    scored = tf.join(F.broadcast(dfreq), "tok").select(
        "doc_id",
        "tok",
        "tf",
        "doc_freq",
        F.expr("tf * 1000000L div doc_freq").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
    )


ORACLE_TFIDF = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS doc_freq FROM toks GROUP BY 1)
SELECT doc_id, tf.tok AS tok, tf.tf AS tf, dfreq.doc_freq AS doc_freq,
       tf.tf * 1000000 // dfreq.doc_freq AS score,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tf.tf * 1000000 // dfreq.doc_freq DESC,
                                        tf.tok) AS BIGINT) AS rk
FROM tf JOIN dfreq USING (tok)
QUALIFY rk <= 3
ORDER BY doc_id, rk
"""


# ---------------------------------------------------------------------------
# kmeans_refine — one Lloyd refinement of the IVF codebook
# ---------------------------------------------------------------------------


def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd step (operators/kmeans.py): seed centroids = per-label
    exact means, reassign every vector, recompute the codebook from the
    new assignment. Output is the refined centroid matrix (cell × dim)
    with member counts — the training loop behind ivf_search's index.
    Full iteration is kmeans_fit (tests/test_kmeans.py: inertia
    non-increasing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = lloyd_step(emb)
    return out.select(
        F.col("cell").cast("long").alias("cell"),
        F.col("d").cast("long").alias("d"),
        "centroid",
        F.col("n_members").cast("long").alias("n_members"),
    ).orderBy("cell", "d")


ORACLE_KMEANS_REFINE = f"""
WITH elems AS (
  SELECT vec_id, label,
         CAST(UNNEST(embedding) AS DOUBLE) AS x,
         GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS d
  FROM embeddings
),
seeds AS (
  SELECT label AS cell, d,
         CAST(SUM(CAST(FLOOR(x * {_PS}) AS BIGINT)) AS DOUBLE) / {_PS} / COUNT(x) AS c
  FROM elems GROUP BY 1, 2
),
dists AS (
  SELECT e.vec_id, s.cell,
         SUM(CAST(FLOOR((e.x - s.c) * (e.x - s.c) * {_PS}) AS BIGINT)) AS d2
  FROM elems e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cell FROM dists
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) = 1
)
SELECT CAST(a.cell AS BIGINT) AS cell, CAST(e.d AS BIGINT) AS d,
       CAST(SUM(CAST(FLOOR(e.x * {_PS}) AS BIGINT)) AS DOUBLE) / {_PS} / COUNT(e.x)
         AS centroid,
       COUNT(*) AS n_members
FROM elems e JOIN assign a USING (vec_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# classifier_filter — linear quality-classifier inference
# ---------------------------------------------------------------------------

_CLS_THRESHOLD = 1500


def q_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based curation (the FastText-quality-filter pattern):
    a linear model with integer weights over per-document features,
    applied corpus-wide as pure JVM arithmetic — model inference as a
    projection, no UDF, no serving infra. Features: distinct-token ratio
    (per-mille) and capped length; integer weights keep both engines
    bit-identical (no float dot product to drift)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    ).select(
        "doc_id",
        F.expr("1000L * n_uniq div n_tok").alias("distinct_milli"),
        F.least("n_tok", F.lit(512)).cast("long").alias("len_cap"),
    )
    return (
        scored.select(
            "doc_id",
            "distinct_milli",
            "len_cap",
            (3 * F.col("distinct_milli") + 2 * F.col("len_cap")).alias("score"),
        )
        .withColumn("keep", (F.col("score") >= _CLS_THRESHOLD).cast("long"))
        .orderBy("doc_id")
    )


ORACLE_CLASSIFIER_FILTER = f"""
WITH feats AS (
  SELECT doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok,
         CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_uniq
  FROM documents
),
scored AS (
  SELECT doc_id,
         1000 * n_uniq // n_tok AS distinct_milli,
         LEAST(n_tok, 512) AS len_cap
  FROM feats
)
SELECT doc_id, distinct_milli, len_cap,
       3 * distinct_milli + 2 * len_cap AS score,
       CAST(3 * distinct_milli + 2 * len_cap >= {_CLS_THRESHOLD} AS BIGINT) AS keep
FROM scored ORDER BY doc_id
"""


REGISTRY: dict[str, QuerySpec] = {
    "seq_pack": QuerySpec(
        q_seq_pack, ORACLE_SEQ_PACK,
        "contiguous-fill 2048-token sequence packing per language",
    ),
    "pack_efficiency": QuerySpec(
        q_pack_efficiency, ORACLE_PACK_EFFICIENCY,
        "per-language packing decision table: sequences, boundary-split "
        "docs (the attention-masking workload), padding waste, "
        "integer-exact fill ppm",
    ),
    "pii_redact": QuerySpec(
        q_pii_redact, ORACLE_PII_REDACT,
        "regex PII scrub with audit counts, md5-checked output",
    ),
    "tfidf_topterms": QuerySpec(
        q_tfidf_topterms, ORACLE_TFIDF,
        "top-3 TF-IDF terms per document (integer-exact score)",
    ),
    "kmeans_refine": QuerySpec(
        q_kmeans_refine, ORACLE_KMEANS_REFINE,
        "one k-means Lloyd refinement of the IVF codebook",
    ),
    "classifier_filter": QuerySpec(
        q_classifier_filter, ORACLE_CLASSIFIER_FILTER,
        "linear quality-classifier inference as a projection",
    ),
}
