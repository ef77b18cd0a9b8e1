"""Training-data-pipeline queries, part 3: BPE-ish token counting,
embedding-cosine near-duplicate detection, and the multimodal decode /
frame-sample plumbing — each with a bit-identical DuckDB oracle.

Beyond the reference surface (north-star extensions per BASELINE.json);
the multimodal stub mirrors how the reference treats opaque payloads
(bronze keeps raw bytes; conformance happens downstream —
/root/reference/src/glue_jobs/streamate/bronze_ingest_streamate_mock.py:32-36).

Scale notes baked into each plan:
- tokenization is a pure per-row projection — embarrassingly parallel,
  whole-stage-codegen, zero shuffle;
- near-dup candidates come from an equi-join on a blocking key (here the
  IVF-style ``label`` cell), never an unblocked cross join — at 100 TB the
  blocking key is the SRP/IVF bucket from operators.similarity;
- the decode stage is mapInPandas over Arrow batches: one Python worker
  per partition, vectorized transfer, linear scaling with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.multimodal import decode_media, documents_as_media
from data_lake_spark.operators.similarity import _to_double, dot_exact, norm_exact
from data_lake_spark.queries import QuerySpec

# GPT-2-style pretokenizer, lookahead-free so Java regex (Spark) and RE2
# (DuckDB) produce identical token streams: contractions, space-prefixed
# letter runs, digit runs, punctuation runs, whitespace runs.
_BPE_PAT = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting with two tokenizers: whitespace split
    and a BPE-style regex pretokenizer (regexp_extract_all — JVM-side, no
    UDF). ``fertility`` = regex tokens per whitespace word, the standard
    tokenizer-cost metric for corpus sizing."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), 0)
    return (
        docs.select(
            "doc_id",
            F.size(ws).cast("long").alias("n_ws_tokens"),
            F.size(bpe).cast("long").alias("n_bpe_tokens"),
            F.size(F.array_distinct(bpe)).cast("long").alias("n_unique_tokens"),
            (F.size(bpe) * 1.0 / F.size(ws)).alias("fertility"),
        )
        .orderBy("doc_id")
    )


ORACLE_BPE_TOKENS = f"""
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_PAT_SQL}')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '{_BPE_PAT_SQL}')))
            AS BIGINT) AS n_unique_tokens,
       LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_PAT_SQL}')) * 1.0
         / LEN(STRING_SPLIT(text, ' ')) AS fertility
FROM documents ORDER BY 1
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate detection
# ---------------------------------------------------------------------------

_NEARDUP_TAU = 0.30


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup assignment: candidate pairs from an
    equi-join on the blocking cell (``label`` — at scale, the IVF/SRP
    bucket), exact cosine verify with the floor-quantized dot recipe,
    then per-vector keeper = min matching lower id. Vectors absent from
    the output are cluster keepers."""
    emb = load_table(spark, sf_dir, "embeddings")
    # materialize the normed vectors once — both self-join sides read it
    # (same pattern as textdedup.minhash_lsh_pairs). Repartition by the
    # blocking cell FIRST: the self-join is then co-partitioned on its
    # key, the pairwise scoring parallelizes across cells, and AQE can't
    # funnel the (explodes-after-the-shuffle) pair space into one task
    # just because the pre-join bytes look small.
    e = (
        emb.select(
            "vec_id",
            "label",
            _to_double("embedding").alias("v"),
        )
        .repartition(16, "label")
        .withColumn("nrm", norm_exact("v"))
        .localCheckpoint(eager=False)
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"), "label",
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), "label",
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    scored = (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (dot_exact("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= _NEARDUP_TAU)
    )
    return (
        scored.groupBy(F.col("vec_b").alias("vec_id"))
        .agg(
            F.min("vec_a").alias("dup_of"),
            F.count(F.lit(1)).alias("n_matches"),
            F.max("cos").alias("max_cosine"),
        )
        .orderBy("vec_id")
    )


ORACLE_EMBEDDING_NEARDUP = f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
),
elems AS (
  SELECT vec_a, vec_b,
         CAST(UNNEST(va) AS DOUBLE) AS xa,
         CAST(UNNEST(vb) AS DOUBLE) AS xb
  FROM pairs
),
sums AS (
  SELECT vec_a, vec_b,
         CAST(SUM(CAST(FLOOR(xa * xb * 1000000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000000.0 AS dot,
         CAST(SUM(CAST(FLOOR(xa * xa * 1000000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000000.0 AS aa,
         CAST(SUM(CAST(FLOOR(xb * xb * 1000000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000000.0 AS bb
  FROM elems GROUP BY 1, 2
),
scored AS (
  SELECT vec_a, vec_b, dot / (SQRT(aa) * SQRT(bb)) AS cos FROM sums
  WHERE dot / (SQRT(aa) * SQRT(bb)) >= {_NEARDUP_TAU}
)
SELECT vec_b AS vec_id,
       MIN(vec_a) AS dup_of,
       COUNT(*) AS n_matches,
       MAX(cos) AS max_cosine
FROM scored GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# multimodal decode + frame sampling (stubbed codec, real plumbing)
# ---------------------------------------------------------------------------

# hex-nibble value, expressible in both engines: strpos over the alphabet
_HEXV = "(STRPOS('0123456789abcdef', SUBSTR(h, {i}, 1)) - 1)"


def _byte_sql(pos: int) -> str:
    """Integer value of sha256-digest byte ``pos`` (0-based) from hex text."""
    hi = _HEXV.format(i=2 * pos + 1)
    lo = _HEXV.format(i=2 * pos + 2)
    return f"(16 * {hi} + {lo})"


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline over opaque binary payloads: documents
    adapted to (media_id, kind, content binary, meta struct), decoded via
    the mapInPandas Arrow stage (deterministic digest-based stub standing
    in for PIL/ffmpeg). The oracle recomputes the stub's digest arithmetic
    in SQL — the Python batch stage is fully checked, not rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    dec = decode_media(documents_as_media(docs), fake=True)
    return dec.select(
        "media_id",
        "kind",
        "n_bytes",
        "sha256",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
    ).orderBy("media_id")


ORACLE_MULTIMODAL_DECODE = f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'video'
              WHEN doc_id % 3 = 1 THEN 'image'
              ELSE 'audio' END AS kind,
         CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
         SHA256(text) AS h
  FROM documents
)
SELECT media_id, kind, n_bytes, h AS sha256,
       CAST(64 + {_byte_sql(0)} % 192 AS BIGINT) AS width,
       CAST(64 + {_byte_sql(1)} % 192 AS BIGINT) AS height,
       CAST(CASE WHEN kind = 'video' THEN 1 + {_byte_sql(2)} % 16
                 ELSE 1 END AS BIGINT) AS n_frames
FROM media ORDER BY 1
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: decode, then explode frame indices
    0..n_frames-1 keeping every 4th (sequence + explode — built-ins; the
    stub stands in for the frame grab)."""
    from data_lake_spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    dec = decode_media(documents_as_media(docs), fake=True)
    return (
        frame_sample(dec, every_n=4)
        .select("media_id", F.col("frame_idx").cast("long").alias("frame_idx"))
        .orderBy("media_id", "frame_idx")
    )


ORACLE_FRAME_SAMPLE = f"""
WITH vids AS (
  SELECT doc_id AS media_id, SHA256(text) AS h
  FROM documents WHERE doc_id % 3 = 0
),
frames AS (
  SELECT media_id,
         UNNEST(GENERATE_SERIES(0, {_byte_sql(2)} % 16)) AS frame_idx
  FROM vids
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx
FROM frames WHERE frame_idx % 4 = 0
ORDER BY 1, 2
"""


def q_length_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-blocking near-dup prefilter: pairs of documents whose char
    counts differ by ≤ 2, via the banded range join (operators/rangejoin.py
    — bucket floor(n/eps), join own+adjacent buckets, exact refine). The
    same plan at 100 TB is one hash shuffle + 3× replication of one side,
    not the O(n²) inequality nested loop Spark would otherwise plan."""
    from data_lake_spark.operators.rangejoin import band_join

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("n_chars").alias("chars_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("n_chars").alias("chars_b"))
    return (
        band_join(a, b, "chars_a", "chars_b", eps=2.0)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "chars_a",
            "chars_b",
            F.abs(F.col("chars_a") - F.col("chars_b")).cast("long").alias("char_diff"),
        )
        .orderBy("doc_a", "doc_b")
    )


ORACLE_LENGTH_BAND_JOIN = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.n_chars AS chars_a, b.n_chars AS chars_b,
       CAST(ABS(a.n_chars - b.n_chars) AS BIGINT) AS char_diff
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND ABS(a.n_chars - b.n_chars) <= 2
ORDER BY 1, 2
"""


def q_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation by per-language quality quantile: score every doc
    (length/stopword heuristic), compute each language's exact p25 with
    ``F.percentile`` (interpolation arithmetic matches DuckDB
    quantile_cont bit-for-bit), broadcast the tiny per-lang thresholds
    back, keep docs at or above threshold. One pass + one broadcast join —
    the shape that drops straight onto a 100 TB corpus."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n_stop = F.size(F.filter(ws, lambda t: t.isin("the", "a", "of", "and", "to")))
    scored = docs.select(
        "doc_id",
        "lang",
        (
            F.least(F.size(ws) / 100.0, F.lit(1.0)) * 0.5
            + (n_stop * 1.0 / F.size(ws)) * 0.5
        ).alias("quality_score"),
    )
    thresholds = scored.groupBy("lang").agg(
        F.percentile("quality_score", 0.25).alias("p25")
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .filter(F.col("quality_score") >= F.col("p25"))
        .select("doc_id", "lang", "quality_score", "p25")
        .orderBy("doc_id")
    )


ORACLE_QUALITY_QUANTILE = """
WITH scored AS (
  SELECT doc_id, lang,
         LEAST(LEN(STRING_SPLIT(text, ' ')) / 100.0, 1.0) * 0.5
           + (LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                              t -> t IN ('the', 'a', 'of', 'and', 'to'))) * 1.0
              / LEN(STRING_SPLIT(text, ' '))) * 0.5 AS quality_score
  FROM documents
),
thresholds AS (
  SELECT lang, QUANTILE_CONT(quality_score, 0.25) AS p25 FROM scored GROUP BY 1
)
SELECT s.doc_id, s.lang, s.quality_score, t.p25
FROM scored s JOIN thresholds t ON s.lang = t.lang
WHERE s.quality_score >= t.p25
ORDER BY s.doc_id
"""


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: term frequency + document frequency per token,
    top-200 by (tf desc, token). One explode + one groupBy — the partial
    (map-side) aggregation means the shuffle carries one row per distinct
    (partition, token), not one per occurrence; at 100 TB the token key
    space shards uniformly. df/tf are the inputs to IDF weighting and
    vocab pruning (IDF's log is left to the caller: transcendental
    functions aren't bit-portable across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(200)
    )


ORACLE_VOCAB_STATS = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
)
SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM toks GROUP BY 1
ORDER BY 2 DESC, 1
LIMIT 200
"""


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup (cell-blocked, centroid-farthest keeper)
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.30
_PS12 = "1000000000000.0"


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semantic_dedup): within each
    cell, pairwise-cosine duplicate groups above τ keep only the member
    FARTHEST from the cell centroid (lowest centroid cosine — the
    least-prototypical example; min-id tiebreak). One row per vector
    with its centroid cosine and drop verdict; centroids come from the
    persisted artifact (stored_centroids), so the prototypicality pass
    is an equi-join against a stored model, not a retrain."""
    from data_lake_spark.operators.similarity import semantic_dedup
    from data_lake_spark.queries.llm2 import stored_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, stored_centroids(spark, sf_dir), tau=_SEMDEDUP_TAU
    ).orderBy("vec_id")


ORACLE_SEMANTIC_DEDUP = f"""
WITH elems AS (
  SELECT vec_id, label,
         CAST(UNNEST(embedding) AS DOUBLE) AS x,
         GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS d
  FROM embeddings
),
cent AS (
  SELECT label AS cell, d,
         CAST(SUM(CAST(FLOOR(x * {_PS12}) AS BIGINT)) AS DOUBLE) / {_PS12} / COUNT(x) AS c
  FROM elems GROUP BY 1, 2
),
vnorm AS (
  SELECT vec_id,
         SQRT(CAST(SUM(CAST(FLOOR(x * x * {_PS12}) AS BIGINT)) AS DOUBLE) / {_PS12}) AS nrm
  FROM elems GROUP BY 1
),
cnorm AS (
  SELECT cell,
         SQRT(CAST(SUM(CAST(FLOOR(c * c * {_PS12}) AS BIGINT)) AS DOUBLE) / {_PS12}) AS cn
  FROM cent GROUP BY 1
),
cdot AS (
  SELECT e.vec_id,
         SUM(CAST(FLOOR(e.x * c.c * {_PS12}) AS BIGINT)) AS dq
  FROM elems e JOIN cent c ON e.label = c.cell AND e.d = c.d
  GROUP BY 1
),
cc AS (
  SELECT v.vec_id, v.label AS cell,
         (CAST(dq AS DOUBLE) / {_PS12}) / (nrm * cn) AS cos_cent
  FROM (SELECT DISTINCT vec_id, label FROM embeddings) v
  JOIN cdot USING (vec_id)
  JOIN vnorm USING (vec_id)
  JOIN cnorm ON cnorm.cell = v.label
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
),
pelems AS (
  SELECT ia, ib,
         CAST(UNNEST(va) AS DOUBLE) AS xa,
         CAST(UNNEST(vb) AS DOUBLE) AS xb
  FROM pairs
),
psums AS (
  SELECT ia, ib,
         CAST(SUM(CAST(FLOOR(xa * xb * {_PS12}) AS BIGINT)) AS DOUBLE) / {_PS12} AS dot
  FROM pelems GROUP BY 1, 2
),
scored AS (
  SELECT p.ia, p.ib
  FROM psums p
  JOIN vnorm n1 ON n1.vec_id = p.ia
  JOIN vnorm n2 ON n2.vec_id = p.ib
  WHERE p.dot / (n1.nrm * n2.nrm) >= {_SEMDEDUP_TAU}
),
orient AS (
  SELECT ib AS x, ia AS y FROM scored
  UNION ALL
  SELECT ia AS x, ib AS y FROM scored
),
dropped AS (
  SELECT DISTINCT b.x AS vec_id
  FROM orient b
  JOIN cc cx ON cx.vec_id = b.x
  JOIN cc cy ON cy.vec_id = b.y
  WHERE cy.cos_cent < cx.cos_cent
     OR (cy.cos_cent = cx.cos_cent AND b.y < b.x)
)
SELECT cc.vec_id, CAST(cc.cell AS BIGINT) AS cell, cc.cos_cent,
       (d.vec_id IS NOT NULL) AS dropped
FROM cc LEFT JOIN dropped d ON d.vec_id = cc.vec_id
ORDER BY cc.vec_id
"""


_SEMDEDUP_MAX_CELL = 64


def q_semantic_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup with the SemDeDup scale knob engaged: pair
    blocking on deterministic sub-cells of ≤~64 members
    (operators/similarity.subsplit_cells), so pairwise cost is
    O(N·max_cell) — flat at any corpus size — instead of quadratic in
    the cell population. Centroid cosines keep the true cell; capped
    drops are a subset of the exact query's drops."""
    from data_lake_spark.operators.similarity import semantic_dedup
    from data_lake_spark.queries.llm2 import stored_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb,
        stored_centroids(spark, sf_dir),
        tau=_SEMDEDUP_TAU,
        max_cell=_SEMDEDUP_MAX_CELL,
    ).orderBy("vec_id")


def _oracle_semantic_capped() -> str:
    from data_lake_spark.queries.curation import _oracle_u16

    u16a = _oracle_u16("a.vec_id")
    u16b = _oracle_u16("b.vec_id")
    nsub = (
        f"CAST(CEIL(CAST(s.n AS DOUBLE) / {_SEMDEDUP_MAX_CELL}) AS BIGINT)"
    )
    # identical to ORACLE_SEMANTIC_DEDUP except the pairs CTE blocks on
    # the sub-cell: same cell AND same u16(id) % ceil(n/max) bucket
    return ORACLE_SEMANTIC_DEDUP.replace(
        """pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
),""",
        f"""sizes AS (
  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, a.embedding AS va, b.embedding AS vb
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
  JOIN sizes s ON s.label = a.label
  WHERE ({u16a}) % {nsub} = ({u16b}) % {nsub}
),""",
    )


REGISTRY: dict[str, QuerySpec] = {
    "semantic_dedup": QuerySpec(
        q_semantic_dedup, ORACLE_SEMANTIC_DEDUP,
        "SemDeDup: cell-blocked cosine dup groups keep the "
        "centroid-farthest member (stored-centroid prototypicality)",
    ),
    "semantic_dedup_capped": QuerySpec(
        q_semantic_dedup_capped, _oracle_semantic_capped(),
        "SemDeDup with sub-split cells (max ~64 members): flat "
        "O(N*max_cell) pair cost — the corpus-scale form",
    ),
    "bpe_tokens": QuerySpec(
        q_bpe_tokens, ORACLE_BPE_TOKENS, "whitespace + BPE-regex token counting"
    ),
    "embedding_neardup": QuerySpec(
        q_embedding_neardup, ORACLE_EMBEDDING_NEARDUP,
        "embedding-cosine near-dup keeper assignment",
    ),
    "multimodal_decode": QuerySpec(
        q_multimodal_decode, ORACLE_MULTIMODAL_DECODE,
        "binary decode via mapInPandas, digest-checked",
    ),
    "frame_sample": QuerySpec(
        q_frame_sample, ORACLE_FRAME_SAMPLE, "video frame sampling plumbing"
    ),
    "length_band_join": QuerySpec(
        q_length_band_join, ORACLE_LENGTH_BAND_JOIN,
        "banded range join (length-blocked near-dup prefilter)",
    ),
    "quality_quantile_filter": QuerySpec(
        q_quality_quantile_filter, ORACLE_QUALITY_QUANTILE,
        "per-language p25 quality-threshold curation",
    ),
    "vocab_stats": QuerySpec(
        q_vocab_stats, ORACLE_VOCAB_STATS,
        "corpus vocabulary: term + document frequency, top-200",
    ),
}
