"""The two SimHash formulations — map-only HOF expression (default)
and explode→groupBy (shuffle regime) — must produce bit-identical
fingerprints; PLANS.md records which regime wins where."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.textdedup import (
    simhash16_expr,
    simhash16_exploded,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_simhash_forms_bit_identical(spark):
    docs = load_table(spark, SF, "documents")
    expr_form = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", simhash16_expr("text").alias("h")
        ).collect()
    }
    exploded_form = {
        r.doc_id: r.simhash16 for r in simhash16_exploded(docs).collect()
    }
    assert expr_form == exploded_form
    assert len(expr_form) == docs.count()


def test_simhash_exploded_handles_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash16 for r in simhash16_exploded(docs).collect()}
    want = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", simhash16_expr("text").alias("h")
        ).collect()
    }
    assert got == want
