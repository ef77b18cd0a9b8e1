"""Python UDTF contract (SURVEY §2.12): the table-valued extension
point produces exactly the rows of its JVM expression twin, composes
with LATERAL in SQL, and handles NULL input."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.udtf_ops import (
    register_sentence_split,
    sentences,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_udtf_matches_expression_form(spark):
    # corpus texts (no periods: 1 row/doc) + constructed multi-sentence
    # texts, so the equality covers both the degenerate and the
    # splitting regime
    docs = load_table(spark, SF, "documents").limit(50).unionByName(
        spark.createDataFrame(
            [
                (9_000_001, "alpha beta. gamma delta. epsilon"),
                (9_000_002, "one. two. three."),
                (9_000_003, "no split here"),
            ],
            "doc_id long, text string",
        ).withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("t"))
        .withColumn("n_chars", F.length("text")),
        allowMissingColumns=True,
    )
    register_sentence_split(spark)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, s.idx, s.sentence "
        "FROM udtf_docs d, LATERAL sentence_split(d.text) s"
    )
    via_expr = sentences(docs)
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_expr.collect()))
    assert a == b and len(a) > 53  # the constructed docs actually split


def test_udtf_null_and_empty_input(spark):
    register_sentence_split(spark)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one. two. three.")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, s.idx, s.sentence "
        "FROM udtf_edge d, LATERAL sentence_split(d.text) s"
    ).collect()
    got = sorted((r.doc_id, r.idx, r.sentence) for r in rows)
    # NULL text and empty text yield no rows; the terminal fragment
    # keeps its own '.' and intermediate fragments are re-terminated
    assert got == [(3, 0, "one."), (3, 1, "two."), (3, 2, "three.")]
