"""ExactSubstr training-data dedup (Lee et al. 2021) as first-class
queries — the industry-standard dedup mode the stack previously lacked:
`line_dedup` (queries/llm6.py) removes repeated WHOLE segments and
`partial_overlap` DETECTS overlapping pairs, but nothing removed long
verbatim substrings at arbitrary offsets crossing segment boundaries.
The operator (operators/textdedup.py:exact_substr_spans) is the k-token
rolling-hash inverted index + extend-and-merge approximation of the
paper's suffix array; tests/test_exact_substr.py proves it removes a
planted 60-token crossover that line-segment dedup provably misses.

Both queries are oracle-paired: the DuckDB SQL mirrors the pipeline
step for step (same md5 gram hashes, same int64 keeper packing, same
gaps-and-islands), so results are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.functions.exact import (
    micro_share_sql,
    oracle_micro_share_sql,
)
from data_lake_spark.operators.textdedup import (
    decontam_spans,
    exact_substr_dedup,
    exact_substr_spans,
)
from data_lake_spark.queries import QuerySpec

_K = 10  # gram width: the resolution of the duplicate index
_MIN_TOKENS = 20  # report/remove threshold (the paper uses 50 @ web scale)


def q_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removable verbatim spans >= 20 tokens (non-keeper occurrences of
    corpus-duplicated runs): (doc_id, span_start, span_tokens)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s = exact_substr_spans(docs, k=_K, min_tokens=_MIN_TOKENS)
    return s.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    ).orderBy("doc_id", "span_start")


def q_exact_substr_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applied transform: every span cut out, remainder reassembled
    in token order; whole-doc copies survive as empty text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substr_dedup(docs, k=_K, min_tokens=_MIN_TOKENS).orderBy(
        "doc_id"
    )


# The oracle replays the identical index: md5 over the same space-joined
# token windows (DuckDB list slicing is 1-based inclusive; positions are
# emitted 0-based to match posexplode), the same doc_id*2^20+pos keeper
# packing, the same islands.
_ORACLE_SPANS_CTE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(t[i:i+{_K}-1], ' ')) AS h
  FROM toks, UNNEST(range(1, len(t) - {_K} + 2)) AS u(i)
),
keep AS (
  SELECT h, min(doc_id * 1048576 + pos) AS keeper
  FROM grams GROUP BY h HAVING count(*) > 1
),
marked AS (
  SELECT g.doc_id, g.pos
  FROM grams g JOIN keep k ON g.h = k.h
  WHERE g.doc_id * 1048576 + g.pos <> k.keeper
),
runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM marked
),
spans AS (
  SELECT doc_id, min(pos) AS span_start,
         max(pos) + {_K} - 1 - min(pos) + 1 AS span_tokens
  FROM runs GROUP BY doc_id, grp
  HAVING max(pos) + {_K} - 1 - min(pos) + 1 >= {_MIN_TOKENS}
)
"""

ORACLE_EXACT_SUBSTR = (
    _ORACLE_SPANS_CTE
    + """
SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
       CAST(span_tokens AS BIGINT) AS span_tokens
FROM spans ORDER BY doc_id, span_start
"""
)

ORACLE_EXACT_SUBSTR_CLEAN = (
    _ORACLE_SPANS_CTE
    + """
, covered AS (
  SELECT DISTINCT doc_id, p AS pos
  FROM spans, UNNEST(range(span_start, span_start + span_tokens)) AS c(p)
),
tok AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
),
kept AS (
  SELECT k.doc_id,
         string_agg(k.tok, ' ' ORDER BY k.pos) AS clean_text,
         count(*) AS n_kept
  FROM tok k LEFT JOIN covered c
    ON k.doc_id = c.doc_id AND k.pos = c.pos
  WHERE c.doc_id IS NULL
  GROUP BY k.doc_id
),
removed AS (
  SELECT doc_id, count(*) AS n_removed FROM covered GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(kept.clean_text, '') AS clean_text,
       CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(removed.n_removed, 0) AS BIGINT) AS n_removed
FROM documents d
LEFT JOIN kept ON d.doc_id = kept.doc_id
LEFT JOIN removed ON d.doc_id = removed.doc_id
ORDER BY d.doc_id
"""
)

_DC_K = 5  # the curation.decontam gram width, kept for comparability
_DC_MIN = 13  # GPT-3's collision width (Brown et al. 2020 §C)
_DC_BENCH = 10  # doc_id < 10 stands in for the eval set (the decontam split)


def q_decontam_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: contaminated token spans (>= 13
    tokens of benchmark-colliding 5-grams, extended+merged) in every
    training doc — where q_decontam (curation.py) only counts per-doc
    gram hits, this locates WHAT to excise."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s = decontam_spans(
        docs.filter(F.col("doc_id") >= _DC_BENCH),
        docs.filter(F.col("doc_id") < _DC_BENCH),
        k=_DC_K,
        min_tokens=_DC_MIN,
    )
    return s.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    ).orderBy("doc_id", "span_start")


ORACLE_DECONTAM_SUBSTR = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(t[i:i+{_DC_K}-1], ' ')) AS h
  FROM toks, UNNEST(range(1, len(t) - {_DC_K} + 2)) AS u(i)
),
bench AS (
  SELECT DISTINCT h FROM grams WHERE doc_id < {_DC_BENCH}
),
marked AS (
  SELECT g.doc_id, g.pos
  FROM grams g JOIN bench b ON g.h = b.h
  WHERE g.doc_id >= {_DC_BENCH}
),
runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM marked
),
spans AS (
  SELECT doc_id, min(pos) AS span_start,
         max(pos) + {_DC_K} - 1 - min(pos) + 1 AS span_tokens
  FROM runs GROUP BY doc_id, grp
  HAVING max(pos) + {_DC_K} - 1 - min(pos) + 1 >= {_DC_MIN}
)
SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
       CAST(span_tokens AS BIGINT) AS span_tokens
FROM spans ORDER BY doc_id, span_start
"""


REGISTRY = {
    "exact_substr": QuerySpec(
        q_exact_substr,
        ORACLE_EXACT_SUBSTR,
        "ExactSubstr dedup spans: verbatim >=20-token runs duplicated "
        "corpus-wide, non-keeper occurrences (rolling-hash inverted "
        "index + extend-and-merge)",
    ),
    "exact_substr_clean": QuerySpec(
        q_exact_substr_clean,
        ORACLE_EXACT_SUBSTR_CLEAN,
        "ExactSubstr applied: duplicated spans excised, remainder "
        "reassembled in token order",
    ),
    "decontam_substr": QuerySpec(
        q_decontam_substr,
        ORACLE_DECONTAM_SUBSTR,
        "span-level benchmark decontamination: locate >=13-token "
        "benchmark-colliding spans in training docs (broadcast bench "
        "grams + islands)",
    ),
}


# ---------------------------------------------------------------------------
# embedding_coverage — cross-modal completeness audit (docs ↔ vectors)
# ---------------------------------------------------------------------------


def q_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage audit between the text corpus and its vector table —
    the first question a retrieval stack asks before serving: per
    source, how many documents have an embedding row (vec_id == doc_id,
    the ingest contract), coverage as a floored micro-share, plus one
    '(orphan vectors)' row counting embeddings with no document (the
    other direction of the same FK). The dq_checks convention applied
    to the multimodal join key.

    Plan: one id equi-join docs→vectors (co-partitionable on the id at
    any scale; the vector side is projected to its key — no embedding
    arrays move), one groupBy(source) over the joined frame, one
    anti-join count for orphans. No broadcast assumption: both sides
    are fact-sized at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id")
    j = docs.join(
        vecs, docs.doc_id == vecs.vec_id, "left"
    ).select("source", F.col("vec_id").isNotNull().alias("has_vec"))
    per_source = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("has_vec"), 1).otherwise(0)).alias("n_with_vec"),
    ).select(
        "source",
        "n_docs",
        "n_with_vec",
        F.expr(micro_share_sql("n_with_vec", "n_docs")).alias(
            "coverage_micro"
        ),
    )
    orphans = (
        vecs.join(docs, vecs.vec_id == docs.doc_id, "left_anti")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_with_vec"))
        .select(
            F.lit("(orphan vectors)").alias("source"),
            F.lit(0).cast("long").alias("n_docs"),
            F.col("n_with_vec").cast("long"),
            F.lit(None).cast("long").alias("coverage_micro"),
        )
    )
    return per_source.unionByName(orphans).orderBy("source")


_COV = oracle_micro_share_sql("n_with_vec", "n_docs")

ORACLE_EMBEDDING_COVERAGE = f"""
WITH j AS (
  SELECT d.source, v.vec_id IS NOT NULL AS has_vec
  FROM documents d LEFT JOIN embeddings v ON d.doc_id = v.vec_id
),
per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN has_vec THEN 1 ELSE 0 END) AS BIGINT)
           AS n_with_vec
  FROM j GROUP BY 1
)
SELECT source, n_docs, n_with_vec,
       CAST({_COV} AS BIGINT) AS coverage_micro
FROM per_source
UNION ALL
SELECT '(orphan vectors)', CAST(0 AS BIGINT),
       CAST(COUNT(*) AS BIGINT), CAST(NULL AS BIGINT)
FROM embeddings v
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = v.vec_id)
ORDER BY source
"""


# ---------------------------------------------------------------------------
# dup_histogram — duplicate-family size distribution
# ---------------------------------------------------------------------------


def q_dup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of exact-duplicate families (md5 of
    lowercased text, the exact_dedup key): for each family size s, how
    many families, how many redundant documents ((s-1) per family) and
    how many redundant tokens they carry — the one-page report that
    says what exact dedup will actually buy before anyone runs it.
    family_size=1 rows are the unique mass (redundant = 0), kept so
    the histogram sums to the corpus.

    Plan: groupBy(content hash) — map-side combinable, uniform key —
    then groupBy(family size) over the FAMILY frame (≤ corpus/s rows),
    map-only arithmetic after. Token counts stay int64: a family's
    token total is bounded by the corpus token count. 2 shuffles."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.md5(F.lower(F.col("text"))).alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    fams = docs.groupBy("h").agg(
        F.count(F.lit(1)).alias("s"),
        F.sum("n_tok").alias("fam_toks"),
        F.max("n_tok").alias("keeper_toks"),
    )
    return (
        fams.groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_families"),
            ((F.col("s") - 1) * F.count(F.lit(1)))
            .cast("long")
            .alias("redundant_docs"),
            F.sum(F.col("fam_toks") - F.col("keeper_toks"))
            .cast("long")
            .alias("redundant_tokens"),
        )
        .select(
            F.col("s").cast("long").alias("family_size"),
            "n_families",
            "redundant_docs",
            "redundant_tokens",
        )
        .orderBy("family_size")
    )


ORACLE_DUP_HISTOGRAM = """
WITH docs AS (
  SELECT md5(lower(text)) AS h,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
fams AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS s,
         CAST(SUM(n_tok) AS BIGINT) AS fam_toks,
         CAST(MAX(n_tok) AS BIGINT) AS keeper_toks
  FROM docs GROUP BY 1
)
SELECT s AS family_size,
       CAST(COUNT(*) AS BIGINT) AS n_families,
       CAST((s - 1) * COUNT(*) AS BIGINT) AS redundant_docs,
       CAST(SUM(fam_toks - keeper_toks) AS BIGINT) AS redundant_tokens
FROM fams GROUP BY s ORDER BY family_size
"""

REGISTRY["embedding_coverage"] = QuerySpec(
    q_embedding_coverage,
    ORACLE_EMBEDDING_COVERAGE,
    "docs↔vectors completeness audit: per-source embedding coverage "
    "micro-share + orphan-vector count (the multimodal FK check)",
)
REGISTRY["dup_histogram"] = QuerySpec(
    q_dup_histogram,
    ORACLE_DUP_HISTOGRAM,
    "exact-duplicate family-size histogram with redundant doc/token "
    "mass — what dedup will buy, measured before running it",
)


# ---------------------------------------------------------------------------
# exact_substr_pairs — dedup provenance: which keeper each copy matches
# ---------------------------------------------------------------------------

_PAIR_MIN_GRAMS = 11  # 11 consecutive k=10 grams == a 20-token run


def q_exact_substr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance of the ExactSubstr removals: for every (copy doc,
    keeper doc) pair, how many duplicated k-grams the copy shares with
    that keeper and where the overlap starts — the lineage table a
    curation audit reads next to exact_substr's spans ("dedup removed
    1.2k tokens from doc X" is actionable only with "...copied from
    doc Y"). Pairs below 11 shared grams (< a 20-token run at k=10)
    are single-collision noise and drop.

    Plan: the same gram index + keeper frame as exact_substr; the
    keeper doc id unpacks from the int64 keeper key (div 2^20), so
    provenance costs ONE extra groupBy over the marked frame — no new
    pair space (pairs only exist where the inverted index already
    placed both docs on one hash)."""
    from data_lake_spark.operators.textdedup import (
        _POS_BITS,
        gram_keeper_marks,
        pack_doc_pos,
        token_kgrams,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = token_kgrams(docs, _K, guard_pos=True).withColumn(
        "enc", pack_doc_pos(F.col("doc_id"), F.col("pos"), pos_bounded=True)
    )
    # keeper + non-keeper marks from the shared salted two-level helper
    # (r11 skew posture — see gram_keeper_marks; same one heavy
    # exchange, no single-task hash, keeper value kept for provenance)
    marked = gram_keeper_marks(grams).select(
        "doc_id",
        "pos",
        F.expr(f"_keeper div {_POS_BITS}").alias("src_doc"),
    )
    return (
        marked.groupBy("doc_id", "src_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_grams"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .filter(F.col("shared_grams") >= _PAIR_MIN_GRAMS)
        .orderBy("doc_id", "src_doc")
    )


ORACLE_EXACT_SUBSTR_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(t[i:i+{_K}-1], ' ')) AS h
  FROM toks, UNNEST(range(1, len(t) - {_K} + 2)) AS u(i)
),
keep AS (
  SELECT h, min(doc_id * 1048576 + pos) AS keeper
  FROM grams GROUP BY h HAVING count(*) > 1
),
marked AS (
  SELECT g.doc_id, g.pos, k.keeper // 1048576 AS src_doc
  FROM grams g JOIN keep k ON g.h = k.h
  WHERE g.doc_id * 1048576 + g.pos <> k.keeper
)
SELECT doc_id, src_doc,
       CAST(COUNT(*) AS BIGINT) AS shared_grams,
       CAST(MIN(pos) AS BIGINT) AS first_pos
FROM marked
GROUP BY doc_id, src_doc
HAVING COUNT(*) >= {_PAIR_MIN_GRAMS}
ORDER BY doc_id, src_doc
"""

REGISTRY["exact_substr_pairs"] = QuerySpec(
    q_exact_substr_pairs,
    ORACLE_EXACT_SUBSTR_PAIRS,
    "ExactSubstr provenance: (copy doc, keeper doc) pairs with shared "
    "duplicated-gram counts — dedup lineage at inverted-index cost",
)


# ---------------------------------------------------------------------------
# takedown_screen — the subtractable gram index, oracle-checked
# ---------------------------------------------------------------------------


def q_takedown_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr screen AFTER a takedown, answered from the FULL
    corpus's gram postings with the deleted documents' rows subtracted
    — never rebuilt from the surviving text. This is the operation a
    GDPR/DMCA takedown forces on a lake-scale dedup index
    (streaming/takedown.py: the index partials are per-(gram, document)
    postings with the document id packed into ``keeper``, so deletion
    is an exact filter), and the oracle proves subtract-then-fold ≡
    rebuild-on-reduced-corpus: the SQL recomputes spans from scratch
    over only the surviving documents. Deleted set: doc_id % 17 == 3
    (deterministic, ~6% of the corpus — legal-request-sized).

    Plan shape: one gram pass + one (h, doc) aggregate over the full
    corpus (the index build, here in-plan for oracle pairing; in
    production it is the already-persisted streaming index), a
    map-side filter for the tombstones, the fold, and the survivors'
    screen join — inverted-index cost throughout, no pair space."""
    from data_lake_spark.operators.textdedup import (
        _POS_BITS,
        exact_substr_spans_from_index,
    )
    from data_lake_spark.streaming.incremental import _gram_partials

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    partials = _gram_partials(docs, _K, "doc_id", "text")
    live = partials.filter(F.expr(f"(keeper DIV {_POS_BITS}) % 17 <> 3"))
    index = live.groupBy("h").agg(
        F.min("keeper").alias("keeper"), F.sum("c").alias("c")
    )
    survivors = docs.filter(F.col("doc_id") % 17 != 3)
    s = exact_substr_spans_from_index(
        survivors, index, k=_K, min_tokens=_MIN_TOKENS
    )
    return s.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    ).orderBy("doc_id", "span_start")


# rebuild-from-scratch on the reduced corpus: if the Spark side's
# subtracted index produced anything else, the takedown machinery
# would be leaking deleted content into dedup decisions
ORACLE_TAKEDOWN_SCREEN = (
    _ORACLE_SPANS_CTE.replace(
        "FROM documents", "FROM documents WHERE doc_id % 17 <> 3"
    )
    + """
SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
       CAST(span_tokens AS BIGINT) AS span_tokens
FROM spans ORDER BY doc_id, span_start
"""
)

REGISTRY["takedown_screen"] = QuerySpec(
    q_takedown_screen,
    ORACLE_TAKEDOWN_SCREEN,
    "takedown propagation: ExactSubstr screen from the full-corpus "
    "gram postings with deleted docs' rows SUBTRACTED (per-(gram,doc) "
    "posting granularity) — oracle proves subtract-then-fold equals "
    "rebuild-on-reduced-corpus",
)
