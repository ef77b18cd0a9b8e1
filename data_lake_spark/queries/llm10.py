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
from data_lake_spark.operators.textdedup import (
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
}
