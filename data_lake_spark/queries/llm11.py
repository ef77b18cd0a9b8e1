"""Training-data-pipeline queries, part 11 (round 7): PII detection at
corpus granularity, URL/domain extraction, HTML boilerplate stripping,
and an embedding-norm audit — each with a bit-identical DuckDB oracle.

Beyond the reference surface (north-star extensions per BASELINE.json —
the reference has no text corpus; its closest analogue is the per-column
conform/validate stage in src/lambdas/ingest/*). Scale notes:

- pii_scan and html_strip are per-row regex projections in whole-stage
  codegen — ONE corpus scan at 100 TB, no UDF, no shuffle until the
  dim-sized rollup;
- url_domains is scan → explode(matches) → groupBy(domain): the shuffle
  carries one row per (partition, domain) after map-side combine, and
  the domain key space is web-host-sized, not corpus-sized;
- embedding_norms rides the exact floor-micros recipe (operators/
  similarity.dot_exact): per-vector work is map-only, the rollup is one
  label-sized shuffle.

The synthetic corpus contains no PII / URLs / markup (lowercase word
soup — verified), so the scan inputs are SALTED deterministically from
doc_id, same convention as q_pii_redact (queries/llm4.py): the salt is
pure literal+arithmetic concat, reproduced textually in the oracle, so
every regex hit is cross-engine-checked rather than vacuously zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import (
    micro_share_sql,
    oracle_micro_share_sql,
)
from data_lake_spark.operators.redact import PII_SCAN_PATTERNS
from data_lake_spark.queries import QuerySpec

REGISTRY: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# pii_scan — corpus-level PII prevalence by language × kind
# ---------------------------------------------------------------------------
#
# The detection-side complement of q_pii_redact's per-doc scrub: before a
# corpus ships, governance wants "how much PII, of which kinds, where" —
# per (lang, kind): documents hit, total matches, and the floored
# micro-share of affected documents. Five kinds (email, ipv4, phone,
# iban, cc) with mutually non-overlapping patterns so counts are
# order-independent.

_PII_SALTS = {
    # kind -> (spark Column factory over doc_id, SQL fragment) — the modulo
    # staggering gives each kind a different, overlapping prevalence
    "email": (3, " contact u", "@example.com"),
    "ipv4": (5, " from 10.1.", ".9"),
    "phone": (7, " call 555-", ""),
    "iban": (11, " acct GB82WEST", ""),
    "cc": (13, " card 4111 1111 1111 ", ""),
}


def _salt_col() -> F.Column:
    did = F.col("doc_id")
    parts = [F.col("text")]
    for kind, (mod, pre, post) in _PII_SALTS.items():
        if kind == "email":
            mid = did.cast("string")
        elif kind == "ipv4":
            mid = (did % 250).cast("string")
        elif kind == "phone":
            mid = (1000 + did % 1000).cast("string")
        elif kind == "iban":
            mid = (10000000 + did % 1000).cast("string")
        else:  # cc
            mid = (1000 + did % 9000).cast("string")
        parts.append(
            F.when(
                did % mod == 0, F.concat(F.lit(pre), mid, F.lit(post))
            ).otherwise(F.lit(""))
        )
    return F.concat(*parts)


def _salt_sql() -> str:
    frags = ["text"]
    mids = {
        "email": "CAST(doc_id AS VARCHAR)",
        "ipv4": "CAST(doc_id % 250 AS VARCHAR)",
        "phone": "CAST(1000 + doc_id % 1000 AS VARCHAR)",
        "iban": "CAST(10000000 + doc_id % 1000 AS VARCHAR)",
        "cc": "CAST(1000 + doc_id % 9000 AS VARCHAR)",
    }
    for kind, (mod, pre, post) in _PII_SALTS.items():
        frags.append(
            f"CASE WHEN doc_id % {mod} = 0"
            f" THEN '{pre}' || {mids[kind]} || '{post}' ELSE '' END"
        )
    return " || ".join(frags)


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII prevalence: per (lang, kind) — documents containing at
    least one match, total matches, and the micro-share of the language's
    documents affected. One scan (all five regexes evaluate per row in
    whole-stage codegen), one lang-sized shuffle; the kind unpivot runs
    on the LANG×KIND frame, not the corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _salt_col().alias("salted")
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for kind in _PII_SALTS:
        pat, _ = PII_SCAN_PATTERNS[kind]
        cnt = F.regexp_count(F.col("salted"), F.lit(pat))
        aggs.append(
            F.sum(F.when(cnt > 0, 1).otherwise(0)).cast("long").alias(f"d_{kind}")
        )
        aggs.append(F.sum(cnt).cast("long").alias(f"h_{kind}"))
    per_lang = docs.groupBy("lang").agg(*aggs)
    stack_args = ", ".join(
        f"'{kind}', d_{kind}, h_{kind}" for kind in _PII_SALTS
    )
    stacked = per_lang.select(
        "lang",
        "n_docs",
        F.expr(
            f"stack({len(_PII_SALTS)}, {stack_args})"
            " AS (kind, docs_hit, n_hits)"
        ),
    )
    return stacked.select(
        "lang",
        "kind",
        "n_docs",
        "docs_hit",
        "n_hits",
        F.expr(micro_share_sql("docs_hit", "n_docs")).alias("prev_micro"),
    ).orderBy("lang", "kind")


def _oracle_pii_scan() -> str:
    cols = []
    for kind in _PII_SALTS:
        pat, _ = PII_SCAN_PATTERNS[kind]
        n = f"LEN(REGEXP_EXTRACT_ALL(salted, '{pat}'))"
        cols.append(
            f"CAST(SUM(CASE WHEN {n} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS d_{kind}"
        )
        cols.append(f"CAST(SUM({n}) AS BIGINT) AS h_{kind}")
    unions = "\nUNION ALL\n".join(
        f"SELECT lang, n_docs, '{kind}' AS kind, d_{kind} AS docs_hit,"
        f" h_{kind} AS n_hits FROM per_lang"
        for kind in _PII_SALTS
    )
    prev = oracle_micro_share_sql("docs_hit", "n_docs")
    return f"""
WITH salted AS (
  SELECT doc_id, lang, {_salt_sql()} AS salted FROM documents
),
per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, {", ".join(cols)}
  FROM salted GROUP BY 1
),
stacked AS (
  {unions}
)
SELECT lang, kind, n_docs, docs_hit, n_hits,
       CAST({prev} AS BIGINT) AS prev_micro
FROM stacked ORDER BY lang, kind
"""


REGISTRY["pii_scan"] = QuerySpec(
    q_pii_scan,
    _oracle_pii_scan(),
    "corpus PII prevalence by language and kind: docs hit, total "
    "matches, micro-share affected — one codegen scan, lang-sized shuffle",
)


# ---------------------------------------------------------------------------
# url_domains — link extraction + per-domain rollup (the C4/CCNet stage)
# ---------------------------------------------------------------------------

_URL_PAT = r"https?://([a-z0-9.-]+)"

_URL_SALT = (
    "text"
    " || CASE WHEN doc_id % 2 = 0 THEN ' see https://site'"
    " || CAST(doc_id % 40 AS VARCHAR) || '.example.org/p/'"
    " || CAST(doc_id AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN ' and http://mirror'"
    " || CAST(doc_id % 7 AS VARCHAR) || '.example.net/x' ELSE '' END"
)


def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain link census over the corpus: extract every URL host
    (regexp_extract_all, capture group 1), explode, roll up to (domain,
    links, distinct docs). The filter-by-domain-blocklist stage of a
    C4-style pipeline reads exactly this table. Scan + explode are
    map-only; the one shuffle is keyed on domain (host-sized space —
    partial aggregation collapses per-partition duplicates first)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_URL_SALT.replace("VARCHAR", "STRING")).alias("salted"),
    )
    hosts = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("salted", F.lit(_URL_PAT), F.lit(1))
        ).alias("domain"),
    )
    return (
        hosts.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_links").desc(), "domain")
    )


ORACLE_URL_DOMAINS = f"""
WITH salted AS (
  SELECT doc_id, {_URL_SALT} AS salted FROM documents
),
hosts AS (
  SELECT doc_id,
         UNNEST(REGEXP_EXTRACT_ALL(salted, '{_URL_PAT}', 1)) AS domain
  FROM salted
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM hosts GROUP BY 1 ORDER BY n_links DESC, domain
"""

REGISTRY["url_domains"] = QuerySpec(
    q_url_domains,
    ORACLE_URL_DOMAINS,
    "URL host extraction + per-domain link census (the blocklist-filter "
    "input of a C4-style pipeline); explode is map-only, one domain shuffle",
)


# ---------------------------------------------------------------------------
# html_strip — boilerplate/tag removal with a byte-exact audit
# ---------------------------------------------------------------------------

_TAG_PAT = "<[^>]*>"

_HTML_SALT = (
    "'<html><p id=\"d' || CAST(doc_id AS VARCHAR) || '\">' || text"
    " || '</p>'"
    " || CASE WHEN doc_id % 4 = 0 THEN '<br/>' ELSE '' END"
    " || '</html>'"
)


def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-style markup strip: remove every ``<...>`` tag, report per-doc
    tag count, raw/clean lengths, and the md5 of the cleaned text (every
    surviving byte checked, the q_pii_redact convention). Map-only — a
    regexp_replace projection in whole-stage codegen, one corpus scan at
    100 TB, zero shuffle before the output sort."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_HTML_SALT.replace("VARCHAR", "STRING")).alias("raw"),
    )
    clean = F.regexp_replace(F.col("raw"), _TAG_PAT, "")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("raw"), F.lit(_TAG_PAT)).cast("long").alias(
            "n_tags"
        ),
        F.length("raw").cast("long").alias("raw_len"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    ).orderBy("doc_id")


ORACLE_HTML_STRIP = f"""
WITH raws AS (
  SELECT doc_id, {_HTML_SALT} AS raw FROM documents
)
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(raw, '{_TAG_PAT}')) AS BIGINT) AS n_tags,
       CAST(LENGTH(raw) AS BIGINT) AS raw_len,
       CAST(LENGTH(REGEXP_REPLACE(raw, '{_TAG_PAT}', '', 'g')) AS BIGINT)
         AS clean_len,
       MD5(REGEXP_REPLACE(raw, '{_TAG_PAT}', '', 'g')) AS clean_md5
FROM raws ORDER BY doc_id
"""

REGISTRY["html_strip"] = QuerySpec(
    q_html_strip,
    ORACLE_HTML_STRIP,
    "markup strip with byte-exact audit (tag count, lengths, md5 of the "
    "cleaned text) — map-only codegen projection, one corpus scan",
)


# ---------------------------------------------------------------------------
# embedding_norms — per-label L2-norm audit over the vector column
# ---------------------------------------------------------------------------


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-hygiene audit: per label, the count and min/max/mean of the
    L2 norm — read before cosine-vs-dot decisions and before trusting
    IVF/PQ training (unnormalized outliers skew centroids). Exactness:
    per-element floor(x²·10¹²) int64 terms (operators/similarity
    recipe; dim·10¹² ≈ 6.4·10¹³ ≪ 2⁶³), norm_micro = floor(√sumsq) —
    int64→double exact below 2⁵³, √ correctly rounded, floor exact —
    and the mean is an integer div of exact sums. Per-vector work is
    map-only; the rollup shuffles the label-sized frame."""
    emb = load_table(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("embedding"),
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(1e12)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    per_vec = emb.select(
        F.col("label").cast("long").alias("label"),
        F.floor(F.sqrt(sumsq.cast("double"))).cast("long").alias(
            "norm_micro"
        ),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm_micro").alias("min_norm_micro"),
            F.max("norm_micro").alias("max_norm_micro"),
            F.expr("SUM(norm_micro) div COUNT(*)").alias("avg_norm_micro"),
        )
        .orderBy("label")
    )


ORACLE_EMBEDDING_NORMS = """
WITH terms AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
              * 1000000000000.0) AS BIGINT) AS t
  FROM (SELECT vec_id, label, UNNEST(embedding) AS x FROM embeddings)
),
per_vec AS (
  SELECT vec_id, label,
         CAST(FLOOR(SQRT(CAST(SUM(t) AS DOUBLE))) AS BIGINT) AS norm_micro
  FROM terms GROUP BY 1, 2
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       MIN(norm_micro) AS min_norm_micro,
       MAX(norm_micro) AS max_norm_micro,
       CAST(SUM(norm_micro) // COUNT(*) AS BIGINT) AS avg_norm_micro
FROM per_vec GROUP BY 1 ORDER BY 1
"""

REGISTRY["embedding_norms"] = QuerySpec(
    q_embedding_norms,
    ORACLE_EMBEDDING_NORMS,
    "per-label L2-norm audit (count, min/max/mean) with the exact "
    "floor-micros recipe — map-only per vector, label-sized shuffle",
)


# ---------------------------------------------------------------------------
# image_dhash_pairs — perceptual near-dup pairs over the image column
# ---------------------------------------------------------------------------


def q_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup end-to-end (operators/imagehash.py):
    documents synthesized into VALID 16×16 BMPs (pure JVM byte concat —
    near-identical texts become near-identical images), REAL pixel
    decode + integer dHash in one Arrow pass, 8-band inverted-index
    candidates (exhaustive for Hamming ≤ 7), exact bit_count refine.
    Per-pair rollup to (media_a, dup-of counts) keeps the output stable.

    Rows-only by design: the oracle cannot decode image bytes in SQL
    (the S7/D3 precedent) — the decode/hash kernel is instead pinned by
    tests/test_imagehash.py (hand-computed dHash, planted near-dup and
    distinct pairs, format-edge BMPs)."""
    from data_lake_spark.operators.imagehash import (
        bmp_from_text_col,
        dhash_table,
        hamming_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = hamming_pairs(dhash_table(bmp_from_text_col(docs)), max_hamming=6)
    return (
        pairs.groupBy("media_a")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_b").alias("first_dup"),
            F.min("hamming").alias("min_hamming"),
        )
        .orderBy("media_a")
    )


REGISTRY["image_dhash_pairs"] = QuerySpec(
    q_image_dhash_pairs,
    None,
    "perceptual image dedup: real BMP pixel decode + integer dHash in "
    "one Arrow pass, 8-band Hamming LSH candidates, bit_count refine — "
    "rows-only (no SQL image decode); kernel pinned by pytest",
)
