"""Training-data-pipeline queries, part 6: corpus-level boilerplate
(segment) dedup and per-source document caps.

Both are curation staples the earlier parts don't cover:

- ``line_dedup`` — CCNet/C4-style line dedup: segments shared across
  MANY documents (boilerplate) are removed from every document while
  intra-document structure is preserved. The corpus here has no newline
  structure, so "lines" are fixed 10-word windows — the operator
  (operators/textdedup.drop_common_segments) takes any segmentation.
- ``source_cap`` — per-domain caps: Common-Crawl-style pipelines bound
  any single domain's contribution; the deterministic md5 rank makes the
  kept set reproducible on any cluster size with no RNG state.

Scale notes: segmentation is a map-only Generate (no shuffle until the
frequency aggregate); the frequency table and anti-join shuffle on the
segment key (uniform — hashed text); reassembly sorts (pos, seg) structs
inside the aggregate, so collect order never matters. source_cap's
window partitions by source — parallel across sources; a single
pathological mega-source is bounded by the cap itself (row_number stops
mattering past k, and AQE skew splitting handles the scan side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.textdedup import drop_common_segments
from data_lake_spark.queries import QuerySpec

_SEG_W = 10  # words per segment ("line")
_CAP_K = 30  # max documents kept per source


def _segments(docs: DataFrame) -> DataFrame:
    """Fixed 10-word segments per document: (doc_id, pos, seg), map-only."""
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).withColumn(
        "n_segs",
        F.ceil(F.size("toks") / F.lit(float(_SEG_W))).cast("long"),
    )
    return toks.select(
        "doc_id",
        "n_segs",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_segs") - 1),
                lambda i: F.array_join(
                    F.slice("toks", i * _SEG_W + 1, _SEG_W), " "
                ),
            )
        ).alias("pos", "seg"),
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-segment removal over the corpus: any 10-word segment
    appearing in the corpus more than once is dropped from every
    document (duplicate document families share all their segments, so
    this also guts exact/near duplicates). Output keeps every document
    (empty text when everything was boilerplate); cleaned text is
    md5-compared to keep the oracle hash small."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = drop_common_segments(_segments(docs), max_freq=1)
    return (
        docs.select("doc_id")
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("clean_md5"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("doc_id")
    )


ORACLE_LINE_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
),
segs AS (
  SELECT doc_id, i AS pos,
         ARRAY_TO_STRING(t[(i * {_SEG_W} + 1):(i * {_SEG_W} + {_SEG_W})], ' ')
           AS seg
  FROM toks
  CROSS JOIN UNNEST(range(CAST(CEIL(LEN(t) / {_SEG_W}.0) AS BIGINT))) AS u(i)
),
hot AS (
  SELECT seg FROM segs GROUP BY 1 HAVING COUNT(*) > 1
),
kept AS (
  SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM hot)
),
rebuilt AS (
  SELECT doc_id, STRING_AGG(seg, ' ' ORDER BY pos, seg) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY 1
)
SELECT d.doc_id,
       MD5(COALESCE(r.text, '')) AS clean_md5,
       COALESCE(r.n_kept, 0) AS n_kept
FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
ORDER BY d.doc_id
"""


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep at most K documents per source,
    chosen by deterministic md5(doc_id) rank — a reproducible uniform
    sample per domain, no RNG. The window partitions by source (parallel
    across sources); output is the kept docs with their in-source rank
    plus the source's total, the shape downstream mixture weighting
    consumes."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _CAP_K)
        .join(F.broadcast(totals), "source")
        .select("doc_id", "source", "rk", "n_source")
        .orderBy("source", "rk")
    )


ORACLE_SOURCE_CAP = f"""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n_source
  FROM documents
)
SELECT doc_id, source, rk, CAST(n_source AS BIGINT) AS n_source
FROM ranked WHERE rk <= {_CAP_K}
ORDER BY source, rk
"""


# ---------------------------------------------------------------------------
# partial_overlap — partial-copy detection from winnowing fingerprints
# ---------------------------------------------------------------------------

_MIN_SHARED = 3


def q_partial_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-copy pair detection: documents sharing >= 3 winnowing
    fingerprints (k=5 tokens, window=4 — the MOSS recipe). Whole-document
    MinHash misses a page that copies two paragraphs from another;
    winnowing guarantees any shared run of >= k+window-1 tokens leaves at
    least one common fingerprint, so the fingerprint equi-join surfaces
    exactly the partial overlaps. ``containment`` = shared / smaller
    profile — the asymmetric-copy score.

    Scale shape: inverted-index self-join on the fingerprint (never
    doc x doc); fingerprints are winnow-sparsified (~1/window of shingle
    count), and at 100 TB the boilerplate-hot fingerprints should be
    frequency-capped before the join exactly like LSH bands
    (operators/textdedup.cap_hot_bands)."""
    from data_lake_spark.operators.textdedup import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fp = winnow_fingerprints(docs, k=5, window=4).localCheckpoint(eager=False)
    cnt = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    pairs = (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("_na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("_nb"))
    return (
        pairs.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / F.least(F.col("_na"), F.col("_nb"))
            ).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


ORACLE_PARTIAL_OVERLAP = f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(STRING_SPLIT(text, ' ')) AS tok,
         GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
  FROM documents
),
hashed AS (
  SELECT doc_id, pos, MD5(sh5) AS h FROM (
    SELECT doc_id, pos,
           tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
               || ' ' || LEAD(tok, 3) OVER w || ' ' || LEAD(tok, 4) OVER w AS sh5
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE sh5 IS NOT NULL
),
fp AS (
  SELECT DISTINCT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
  FROM hashed
),
cnt AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM fp a JOIN fp b
    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {_MIN_SHARED}
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       CAST(p.n_shared AS DOUBLE) / LEAST(ca.n_fp, cb.n_fp) AS containment
FROM pairs p
JOIN cnt ca ON p.doc_a = ca.doc_id
JOIN cnt cb ON p.doc_b = cb.doc_id
ORDER BY 1, 2
"""





# ---------------------------------------------------------------------------
# curation_funnel — the whole pipeline as one query with retention stats
# ---------------------------------------------------------------------------

_F_NGRAM = 5
_F_CAP = 40


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation chain as one composable query, reporting
    the doc/token retention funnel every production pipeline publishes:

    raw → quality gate (length bounds) → exact dedup (min-id keeper per
    text hash) → boilerplate gate (≥2 non-boilerplate segments) →
    benchmark decontamination (no shared 5-gram with the eval set, GPT-3
    style) → per-source cap (deterministic hash rank ≤ 40).

    Each stage is defined over the PREVIOUS stage's survivors (keeper
    election, boilerplate frequency, and source ranks are all computed
    within the surviving set — the semantics a sequential pipeline run
    would produce). Intermediate frames are lazily checkpointed so the
    six stage aggregates don't recompute the chain. Output: one row per
    stage with surviving docs and whitespace tokens — integers only,
    bit-stable everywhere."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_toks"),
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_toks"), F.lit(0)).cast("long").alias("n_tokens"),
        )

    d0 = docs
    d1 = d0.filter((F.col("n_toks") >= 10) & (F.col("n_toks") <= 500))
    # exact dedup among survivors: min-id keeper per text hash
    wdup = Window.partitionBy(F.md5("text"))
    d2 = (
        d1.withColumn("_min_id", F.min("doc_id").over(wdup))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
        .localCheckpoint(eager=False)
    )
    # boilerplate gate among survivors: >= 2 segments that are corpus-unique
    segs = _segments(d2)
    hot = (
        segs.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("seg")
    )
    kept_per_doc = (
        segs.join(hot, "seg", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n_kept"))
        .filter(F.col("_n_kept") >= 2)
        .select("doc_id")
    )
    d3 = d2.join(kept_per_doc, "doc_id", "left_semi").localCheckpoint(eager=False)
    # decontam: corpus = doc_id >= 10; benchmark 5-grams from doc_id < 10
    tok = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    grams = (
        tok.select("doc_id", "toks", F.posexplode("toks").alias("i", "w"))
        .filter(F.col("i") <= F.size("toks") - _F_NGRAM)
        .select(
            "doc_id",
            F.expr(f"concat_ws(' ', slice(toks, i + 1, {_F_NGRAM}))").alias("g"),
        )
    )
    bench = grams.filter(F.col("doc_id") < 10).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    d4 = (
        d3.filter(F.col("doc_id") >= 10)
        .join(contaminated, "doc_id", "left_anti")
        .localCheckpoint(eager=False)
    )
    # per-source cap among survivors
    wcap = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    d5 = d4.withColumn("_rk", F.row_number().over(wcap)).filter(
        F.col("_rk") <= _F_CAP
    )
    funnel = (
        stage(d0, "s0_raw")
        .unionByName(stage(d1, "s1_quality"))
        .unionByName(stage(d2, "s2_exact_dedup"))
        .unionByName(stage(d3, "s3_boilerplate"))
        .unionByName(stage(d4, "s4_decontam"))
        .unionByName(stage(d5, "s5_source_cap"))
    )
    return funnel.orderBy("stage")


ORACLE_CURATION_FUNNEL = f"""
WITH d0 AS (
  SELECT doc_id, source, text,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
d1 AS (SELECT * FROM d0 WHERE n_toks BETWEEN 10 AND 500),
d2 AS (
  SELECT doc_id, source, text, n_toks FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY MD5(text)) AS _min_id FROM d1
  ) WHERE doc_id = _min_id
),
segs AS (
  SELECT d.doc_id,
         ARRAY_TO_STRING(
           STRING_SPLIT(d.text, ' ')[(i * {_SEG_W} + 1):(i * {_SEG_W} + {_SEG_W})],
           ' ') AS seg
  FROM d2 d
  CROSS JOIN UNNEST(range(CAST(CEIL(LEN(STRING_SPLIT(d.text, ' ')) / {_SEG_W}.0)
                          AS BIGINT))) AS u(i)
),
hot AS (SELECT seg FROM segs GROUP BY 1 HAVING COUNT(*) > 1),
kept AS (
  SELECT doc_id FROM segs WHERE seg NOT IN (SELECT seg FROM hot)
  GROUP BY 1 HAVING COUNT(*) >= 2
),
d3 AS (SELECT d.* FROM d2 d JOIN kept k ON d.doc_id = k.doc_id),
t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM d0),
pos AS (SELECT doc_id, GENERATE_SUBSCRIPTS(w, 1) AS i FROM t),
grams AS (
  SELECT p.doc_id,
         ARRAY_TO_STRING(LIST_SLICE(t.w, p.i, p.i + {_F_NGRAM - 1}), ' ') AS g
  FROM pos p JOIN t ON p.doc_id = t.doc_id
  WHERE p.i + {_F_NGRAM - 1} <= ARRAY_LENGTH(t.w)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
contaminated AS (
  SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id >= 10
),
d4 AS (
  SELECT d.* FROM d3 d
  WHERE d.doc_id >= 10
    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
d5 AS (
  SELECT * FROM (
    SELECT d.*,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id)
             AS _rk
    FROM d4 d
  ) WHERE _rk <= {_F_CAP}
)
SELECT stage, n_docs, n_tokens FROM (
  SELECT 's0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens FROM d0
  UNION ALL
  SELECT 's1_quality', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM d1
  UNION ALL
  SELECT 's2_exact_dedup', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM d2
  UNION ALL
  SELECT 's3_boilerplate', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM d3
  UNION ALL
  SELECT 's4_decontam', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM d4
  UNION ALL
  SELECT 's5_source_cap', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM d5
) ORDER BY stage
"""


REGISTRY: dict[str, QuerySpec] = {
    "line_dedup": QuerySpec(
        q_line_dedup, ORACLE_LINE_DEDUP,
        "corpus boilerplate-segment removal (C4/CCNet line dedup)",
    ),
    "source_cap": QuerySpec(
        q_source_cap, ORACLE_SOURCE_CAP,
        "per-source cap via deterministic hash rank",
    ),
    "partial_overlap": QuerySpec(
        q_partial_overlap, ORACLE_PARTIAL_OVERLAP,
        "partial-copy pairs from winnowing fingerprints",
    ),
    "curation_funnel": QuerySpec(
        q_curation_funnel, ORACLE_CURATION_FUNNEL,
        "end-to-end curation chain with per-stage retention",
    ),
}


# ---------------------------------------------------------------------------
# mirror_matrix — cross-source duplication attribution
# ---------------------------------------------------------------------------


def q_mirror_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources mirror which: for every FULL 10-word segment (the
    llm6 boilerplate unit) shared across sources, one row per unordered
    source pair — (source_a < source_b, n_shared segments, distinct
    docs involved on each side). The provenance matrix a curation run
    reads before source caps: a heavy pair means one feed syndicates or
    templates the other, so their combined cap should be one source's
    worth, not two. Segment-level (not whole-document md5) because real
    mirrors edit headers/footers — exact-content sharing across sources
    is empty at sf0.01 while segment sharing is dense at every SF.

    Scale shape: segment families collapse to ONE row per
    (segment-hash, source) with a DISTINCT doc count BEFORE any pairing
    (groupBy on the hash key — the line_dedup shuffle), so the pair
    space per hash is bounded by |sources|² (the source dim is small by
    construction) and never by document multiplicity — a segment shared
    by 10⁶ docs in two mirrors contributes exactly one pair row. The
    pairing itself is a self-equi-join on the hash key. Partial tail
    segments (< 10 words) are excluded: two-word tails collide
    spuriously and would read as mirroring."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).withColumn(
        "n_full", (F.size("toks") / F.lit(_SEG_W)).cast("long")
    )
    # sequence(0, n_full-1) DESCENDS when n_full == 0 (the bpe_learn
    # trap) — guard short docs to an empty segment list instead
    segs = toks.select(
        "source",
        "doc_id",
        F.explode(
            F.when(
                F.col("n_full") >= 1,
                F.transform(
                    F.sequence(F.lit(0), F.col("n_full") - 1),
                    lambda i: F.array_join(
                        F.slice("toks", i * _SEG_W + 1, _SEG_W), " "
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("seg"),
    )
    hs = (
        segs.select("source", "doc_id", F.md5(F.col("seg")).alias("h"))
        .groupBy("h", "source")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    )
    a = hs.select(
        "h", F.col("source").alias("source_a"), F.col("n_docs").alias("da")
    )
    b = hs.select(
        "h", F.col("source").alias("source_b"), F.col("n_docs").alias("db")
    )
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum("da").cast("long").alias("docs_a"),
            F.sum("db").cast("long").alias("docs_b"),
        )
        .orderBy("source_a", "source_b")
    )


ORACLE_MIRROR_MATRIX = f"""
WITH toks AS (
  SELECT source, doc_id,
         UNNEST(STRING_SPLIT(text, ' ')) AS tok,
         GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
  FROM documents
),
segs AS (
  SELECT source, doc_id,
         MD5(STRING_AGG(tok, ' ' ORDER BY pos)) AS h
  FROM (SELECT source, doc_id, tok, pos,
               (pos - 1) // {_SEG_W} AS seg_idx FROM toks)
  GROUP BY source, doc_id, seg_idx
  HAVING COUNT(*) = {_SEG_W}
),
hs AS (
  SELECT h, source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM segs GROUP BY 1, 2
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       CAST(SUM(a.n_docs) AS BIGINT) AS docs_a,
       CAST(SUM(b.n_docs) AS BIGINT) AS docs_b
FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


REGISTRY["mirror_matrix"] = QuerySpec(
    q_mirror_matrix,
    ORACLE_MIRROR_MATRIX,
    "cross-source exact-dup attribution: unordered source pairs per "
    "shared content hash (dup families collapsed before pairing)",
)
