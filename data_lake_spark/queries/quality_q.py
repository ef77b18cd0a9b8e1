"""Quality-report query: the one-pass quality gate (quality.py) as a
driver-checkable query — per-check violation counts over ``documents``,
one scan, unpivoted to (check, violations) rows.

Oracle-checked so the gate's arithmetic itself is under the DuckDB
cross-engine contract, not just unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.queries import QuerySpec

_LANGS = ("en", "de", "fr", "es", "pt")


def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five checks compiled into one aggregate, then stacked to rows."""
    d = load_table(spark, sf_dir, "documents")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        cnt(F.col("text").isNull()).alias("c_null_text"),
        (F.count("doc_id") - F.count_distinct("doc_id"))
        .cast("long")
        .alias("c_dup_id"),
        cnt(
            F.col("n_chars").isNotNull()
            & (F.col("n_chars") != F.length("text"))
        ).alias("c_len_mismatch"),
        cnt(F.col("lang").isNotNull() & ~F.col("lang").isin(*_LANGS)).alias(
            "c_bad_lang"
        ),
        cnt(F.col("n_chars") <= 0).alias("c_empty"),
    )
    return agg.select(
        F.expr(
            "stack(6, "
            "'rows', n_rows, "
            "'null_text', c_null_text, "
            "'dup_doc_id', c_dup_id, "
            "'len_mismatch', c_len_mismatch, "
            "'bad_lang', c_bad_lang, "
            "'empty_doc', c_empty) AS (check_name, violations)"
        )
    ).orderBy("check_name")


ORACLE_QUALITY_REPORT = f"""
WITH a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS c_null_text,
         CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) AS c_dup_id,
         CAST(SUM(CASE WHEN n_chars IS NOT NULL
                        AND n_chars <> LENGTH(text) THEN 1 ELSE 0 END)
              AS BIGINT) AS c_len_mismatch,
         CAST(SUM(CASE WHEN lang IS NOT NULL
                        AND lang NOT IN {tuple(_LANGS)!r} THEN 1 ELSE 0 END)
              AS BIGINT) AS c_bad_lang,
         CAST(SUM(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_empty
  FROM documents
)
SELECT check_name, violations FROM (
  SELECT 'rows' AS check_name, n_rows AS violations FROM a
  UNION ALL SELECT 'null_text', c_null_text FROM a
  UNION ALL SELECT 'dup_doc_id', c_dup_id FROM a
  UNION ALL SELECT 'len_mismatch', c_len_mismatch FROM a
  UNION ALL SELECT 'bad_lang', c_bad_lang FROM a
  UNION ALL SELECT 'empty_doc', c_empty FROM a
) ORDER BY check_name
"""


REGISTRY: dict[str, QuerySpec] = {
    "quality_report": QuerySpec(
        q_quality_report, ORACLE_QUALITY_REPORT,
        "one-pass data-quality violation counts over documents",
    ),
}
