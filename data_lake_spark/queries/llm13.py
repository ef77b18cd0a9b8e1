"""Training-data-pipeline queries, part 13 (round 8): perceptual audio
dedup over the REAL WAV decode path, and perceptual video dedup over
REAL RIFF/AVI frame extraction.

Beyond the reference surface (BASELINE.json north_star "multimodal
columns"). Completes the near-dup family across every modality — text
(ExactSubstr/MinHash/SimHash), images (dHash), audio (envelope
fingerprint), video (per-frame dHash) — on the ONE shared topology:
single Arrow hash pass → banded inverted-index candidates → exact
refine, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import (
    micro_share_sql,
    oracle_micro_share_sql,
)
from data_lake_spark.queries import QuerySpec

REGISTRY: dict[str, QuerySpec] = {}


# ---------------------------------------------------------------------------
# audio_fp_pairs — perceptual near-dup pairs over the audio column
# ---------------------------------------------------------------------------


def q_audio_fp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio dedup end-to-end (operators/audiofp.py):
    documents synthesized into VALID 8-bit PCM WAVs (pure JVM byte
    concat — near-identical texts become near-identical waveforms),
    REAL RIFF/PCM sample decode + integer envelope-difference
    fingerprint in one Arrow pass, 8-band inverted-index candidates
    (exhaustive for Hamming ≤ 7 by pigeonhole), exact bit_count refine.
    Per-clip rollup to (media_a, dup-of counts) keeps the output
    stable — the image_dhash_pairs shape on the audio column.

    Rows-only by design: the oracle cannot decode audio bytes in SQL
    (the image_dhash_pairs precedent) — the decode/fingerprint kernel
    is instead pinned by tests/test_audiofp.py (hand-derived bits, an
    independent scalar reference, exact volume invariance, planted
    near-dup pairs, 16-bit/stereo/truncated decode edges)."""
    from data_lake_spark.operators.audiofp import (
        audio_pairs,
        wav_from_text_col,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = audio_pairs(wav_from_text_col(docs), max_hamming=6)
    return (
        pairs.groupBy("media_a")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_b").alias("first_dup"),
            F.min("hamming").alias("min_hamming"),
        )
        .orderBy("media_a")
    )


REGISTRY["audio_fp_pairs"] = QuerySpec(
    q_audio_fp_pairs,
    None,
    "perceptual audio dedup: real RIFF/PCM sample decode + integer "
    "envelope-difference fingerprint in one Arrow pass, 8-band Hamming "
    "LSH candidates, bit_count refine — rows-only (no SQL audio "
    "decode); kernel pinned by pytest",
)


# ---------------------------------------------------------------------------
# video_frame_pairs — frame-aligned near-dup pairs over the video column
# ---------------------------------------------------------------------------


def q_video_frame_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual video dedup end-to-end (operators/videofp.py):
    documents synthesized into VALID 4-frame uncompressed-DIB AVIs
    (pure JVM byte concat), REAL RIFF/AVI frame extraction + the image
    dHash kernel per frame in one Arrow pass, frame-aligned 8-band
    candidates, every-frame bit_count refine. Per-clip rollup keeps
    the output stable — the image/audio shape, one modality up.

    Rows-only by design: the oracle cannot walk a RIFF tree in SQL —
    the extraction/refine kernel is pinned by tests/test_videofp.py
    (synthesis round-trip vs the image kernel, planted frame-aligned
    near-dups, the one-bad-frame rejection, decode edges)."""
    from data_lake_spark.operators.videofp import (
        avi_from_text_col,
        video_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = video_pairs(avi_from_text_col(docs), max_hamming=6)
    return (
        pairs.groupBy("media_a")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_b").alias("first_dup"),
            F.max("max_frame_hamming").alias("worst_frame_hamming"),
        )
        .orderBy("media_a")
    )


REGISTRY["video_frame_pairs"] = QuerySpec(
    q_video_frame_pairs,
    None,
    "perceptual video dedup: real RIFF/AVI frame extraction + image "
    "dHash per frame in one Arrow pass, frame-aligned 8-band Hamming "
    "LSH candidates, every-frame bit_count refine — rows-only (no SQL "
    "container walk); kernel pinned by pytest",
)


# ---------------------------------------------------------------------------
# video_clip_spans — recut-clip detection across videos at any offset
# ---------------------------------------------------------------------------


def q_video_clip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip detection (operators/videofp.video_clip_spans): contiguous
    frame runs shared across videos at ANY offset — the ExactSubstr
    dedup machinery run on frame-hash token sequences, one operator
    family across text and video. Frame-aligned whole-clip near-dup is
    video_frame_pairs; this catches the recut/shifted copies that
    alignment misses.

    Corpus synthesis models recut broadcast footage: one document per
    FRAME, videos cut as stride-2 sliding windows over the doc_id
    frame stream (avi_from_frame_text_cols) — consecutive clips
    genuinely share 2-frame runs at DIFFERENT offsets, exactly the
    structure a recut detector exists for. The window joins are key-
    arithmetic equi-joins (doc_id + j), never a global-order window.
    Per-clip rollup keeps the output stable.

    Rows-only by design (no SQL container walk); the token rendering +
    span algebra are pinned by tests/test_videofp.py's planted
    offset-clip case (found here, invisible to the aligned pairs) and
    textdedup's ExactSubstr property suite."""
    from data_lake_spark.operators.videofp import (
        avi_from_frame_text_cols,
        video_clip_spans,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("media_id"), F.col("text").alias("t0")
    )
    for j in (1, 2, 3):
        base = base.join(
            docs.select(
                (F.col("doc_id") - j).alias("media_id"),
                F.col("text").alias(f"t{j}"),
            ),
            "media_id",
        )
    media = avi_from_frame_text_cols(base, "media_id", ["t0", "t1", "t2", "t3"])
    spans = video_clip_spans(media, min_frames=2)
    return (
        spans.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_frames").alias("clip_frames"),
            F.min("span_start").alias("first_span_start"),
        )
        .orderBy("media_id")
    )


REGISTRY["video_clip_spans"] = QuerySpec(
    q_video_clip_spans,
    None,
    "recut-clip detection: ExactSubstr over frame-hash token sequences "
    "— shared contiguous frame runs at any offset, reported as "
    "removable spans; rows-only (no SQL container walk)",
)


# ---------------------------------------------------------------------------
# domain_doc_quality — the blocklist DECISION table (url_domains' sequel)
# ---------------------------------------------------------------------------
#
# url_domains counts links; a C4-style blocklist decision also needs to
# know WHAT is linking: a domain cited by many short low-content docs is
# spam-shaped, one cited by long documents is citation-shaped. Per
# domain: link count, distinct docs, mean linking-doc length (floored
# integer), and the domain's micro-share of all corpus links — all
# integer-exact, one extract+explode scan, one domain-keyed shuffle with
# map-side combine (the host-sized key space of url_domains).

_URL_PAT_Q = r"https?://([A-Za-z0-9.-]+)"
_URL_SALT_Q = (
    "text"
    " || CASE WHEN doc_id % 2 = 0 THEN ' see https://site'"
    " || CAST(doc_id % 40 AS VARCHAR) || '.example.org/p/'"
    " || CAST(doc_id AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN ' and http://mirror'"
    " || CAST(doc_id % 7 AS VARCHAR) || '.example.net/x' ELSE '' END"
)


def q_domain_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.expr(_URL_SALT_Q.replace("VARCHAR", "STRING")).alias("salted"),
    )
    hosts = docs.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.regexp_extract_all("salted", F.lit(_URL_PAT_Q), F.lit(1))
        ).alias("domain"),
    )
    per_dom = hosts.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    w_all = Window.partitionBy(F.lit(0))
    return (
        per_dom.withColumn("total_links", F.sum("n_links").over(w_all))
        .select(
            "domain",
            "n_links",
            "n_docs",
            F.expr("sum_chars div n_links").alias("avg_link_doc_chars"),
            F.expr(micro_share_sql("n_links", "total_links")).alias(
                "link_share_micro"
            ),
        )
        .orderBy(F.col("n_links").desc(), "domain")
    )


ORACLE_DOMAIN_DOC_QUALITY = f"""
WITH salted AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         {_URL_SALT_Q} AS salted
  FROM documents
),
hosts AS (
  SELECT doc_id, n_chars,
         UNNEST(REGEXP_EXTRACT_ALL(salted, 'https?://([A-Za-z0-9.-]+)', 1))
           AS domain
  FROM salted
),
per_dom AS (
  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_links,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM hosts GROUP BY 1
),
tot AS (
  SELECT *, CAST(SUM(n_links) OVER () AS BIGINT) AS total_links
  FROM per_dom
)
SELECT domain, n_links, n_docs,
       CAST(sum_chars // n_links AS BIGINT) AS avg_link_doc_chars,
       CAST({oracle_micro_share_sql("n_links", "total_links")} AS BIGINT)
         AS link_share_micro
FROM tot ORDER BY n_links DESC, domain
"""

REGISTRY["domain_doc_quality"] = QuerySpec(
    q_domain_doc_quality,
    ORACLE_DOMAIN_DOC_QUALITY,
    "per-domain blocklist decision table: link census + mean "
    "linking-doc length + link micro-share, integer-exact — one "
    "extract+explode scan, one domain-keyed shuffle",
)


# ---------------------------------------------------------------------------
# dup_rate_by_source — what dedup will buy, per source, before running it
# ---------------------------------------------------------------------------
#
# The first question a curation pipeline asks of a new source: how much
# of it is copies? Exact content-hash families per source (md5 of the
# text — the exact_dedup definition), rolled up to docs / distinct
# texts / redundant docs / a floored micro dup-rate. One scan, one
# (source, hash)-keyed aggregate that map-side-combines, then a
# source-sized rollup — scan-linear at any corpus size, and the
# decision number (keep the source? dedup it first?) is exact.


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.md5(F.col("text")).alias("h")
    )
    fam = docs.groupBy("source", "h").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        fam.groupBy("source")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_distinct_texts"),
            (F.sum("n") - F.count(F.lit(1))).alias("n_redundant"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct_texts",
            "n_redundant",
            F.expr(micro_share_sql("n_redundant", "n_docs")).alias(
                "dup_rate_micro"
            ),
        )
        .orderBy("source")
    )


ORACLE_DUP_RATE_BY_SOURCE = f"""
WITH fam AS (
  SELECT source, MD5(text) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
per_source AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_texts,
         CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_redundant
  FROM fam GROUP BY 1
)
SELECT source, n_docs, n_distinct_texts, n_redundant,
       CAST({oracle_micro_share_sql("n_redundant", "n_docs")} AS BIGINT)
         AS dup_rate_micro
FROM per_source ORDER BY source
"""

REGISTRY["dup_rate_by_source"] = QuerySpec(
    q_dup_rate_by_source,
    ORACLE_DUP_RATE_BY_SOURCE,
    "per-source exact-copy census: docs / distinct texts / redundant "
    "docs / floored micro dup-rate — the what-will-dedup-buy audit, "
    "one scan + one map-side-combinable (source, hash) aggregate",
)
