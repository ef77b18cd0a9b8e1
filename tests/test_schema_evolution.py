"""Schema evolution at the storage layer: additive columns across
parquet appends must be readable (mergeSchema), old readers must keep
working (column pruning ignores the new column), and the conform layer
must present one stable schema either way — the property a long-lived
100 TB table needs when producers upgrade before consumers."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_v1(spark, path):
    spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).write.mode("overwrite").parquet(path)


def _append_v2(spark, path):
    spark.range(5, 8).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit("new").alias("tag"),
    ).write.mode("append").parquet(path)


def test_additive_column_merge_schema(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_v1(spark, path)
    _append_v2(spark, path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "v", "tag"}
    assert merged.count() == 8
    # v1 rows surface the new column as NULL, v2 rows carry it
    assert merged.filter(F.col("tag").isNull()).count() == 5
    assert merged.filter(F.col("tag") == "new").count() == 3


def test_old_reader_unaffected(spark, tmp_path):
    """A consumer projecting only the v1 columns reads both file
    generations without mergeSchema — additive evolution never breaks
    existing queries."""
    path = str(tmp_path / "tbl")
    _write_v1(spark, path)
    _append_v2(spark, path)
    old_view = spark.read.parquet(path).select("k", "v")
    assert old_view.count() == 8
    assert old_view.agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(8))


def test_conform_presents_stable_schema(spark, tmp_path):
    """The conform step (coalesce new columns to typed defaults) gives
    downstream one fixed contract regardless of which producers have
    upgraded — the silver-layer discipline from SURVEY §1.4."""
    path = str(tmp_path / "tbl")
    _write_v1(spark, path)
    _append_v2(spark, path)
    conformed = (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select(
            "k",
            "v",
            F.coalesce(F.col("tag"), F.lit("unknown")).alias("tag"),
        )
    )
    assert conformed.filter(F.col("tag") == "unknown").count() == 5
    assert conformed.schema["tag"].dataType.simpleString() == "string"
