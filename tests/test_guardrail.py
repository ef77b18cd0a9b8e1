"""Scan-budget guardrail (reference: Athena workgroup
BytesScannedCutoffPerQuery, data-lake-stack.yml:284-286): the estimate must
reflect Catalyst's column pruning and partition pruning, and enforcement
must reject over-budget queries before execution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.guardrail import (
    ScanBudgetExceeded,
    check_scan_budget,
    estimate_scan_bytes,
)


def test_column_pruning_lowers_estimate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    full = estimate_scan_bytes(li)
    one = estimate_scan_bytes(li.select("l_orderkey").groupBy().count())
    assert full.total_bytes > 0
    assert one.total_bytes < full.total_bytes / 2  # 1 of 16 columns
    file_bytes = os.path.getsize(os.path.join(sf_dir, "lineitem.parquet"))
    assert full.total_bytes <= file_bytes  # never exceeds physical size


def test_partition_pruning_lowers_estimate(spark, tmp_path):
    df = spark.range(0, 10_000).withColumn(
        "part", (F.col("id") % 4).cast("string")
    )
    path = str(tmp_path / "parts")
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    whole = spark.read.parquet(path)
    pruned = whole.filter(F.col("part") == "2")
    est_all = estimate_scan_bytes(whole.agg(F.sum("id")))
    est_one = estimate_scan_bytes(pruned.agg(F.sum("id")))
    assert est_one.total_bytes < est_all.total_bytes
    assert est_one.relations[0].n_files < est_all.relations[0].n_files


def test_not_equal_partition_filter_never_underestimates(spark, tmp_path):
    """`part != '2'` renders as `NOT (part = 2)` in PartitionFilters; the
    inner equality must NOT be misread as an inclusion filter (which would
    price the query at exactly the EXCLUDED partition). The estimate must
    cover at least the three non-excluded partitions' bytes."""
    df = spark.range(0, 10_000).withColumn(
        "part", (F.col("id") % 4).cast("string")
    )
    path = str(tmp_path / "parts_ne")
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    whole = spark.read.parquet(path)
    est_all = estimate_scan_bytes(whole.agg(F.sum("id")))
    est_ne = estimate_scan_bytes(
        whole.filter(F.col("part") != "2").agg(F.sum("id"))
    )
    # != prunes at most one of four roughly equal partitions
    assert est_ne.total_bytes >= est_all.total_bytes * 3 / 4 * 0.9
    est_one = estimate_scan_bytes(
        whole.filter(F.col("part") == "2").agg(F.sum("id"))
    )
    assert est_ne.total_bytes > est_one.total_bytes


def test_unmatchable_partition_literal_leaves_list_unpruned(spark, tmp_path):
    """When the plan's literal rendering can't be matched to any directory
    (here: partition values with spaces, truncated by the equality regex),
    the estimator must keep the full file list (over-estimate), not drop
    every file of the partitioned column (~0-byte under-estimate)."""
    df = spark.range(0, 4_000).withColumn(
        "part",
        F.when(F.col("id") % 2 == 0, F.lit("a b")).otherwise(F.lit("c d")),
    )
    path = str(tmp_path / "parts_sp")
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    whole = spark.read.parquet(path)
    est_all = estimate_scan_bytes(whole.agg(F.sum("id")))
    est_sel = estimate_scan_bytes(
        whole.filter(F.col("part") == "a b").agg(F.sum("id"))
    )
    assert est_sel.total_bytes > 0
    # must not under-estimate below what the selected partition costs;
    # leaving the listing unpruned (== est_all) is the acceptable outcome
    assert est_sel.total_bytes >= est_all.total_bytes / 2


def test_enforcement_blocks_and_passes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ScanBudgetExceeded):
        check_scan_budget(li, max_bytes=10)
    est = check_scan_budget(li, max_bytes=10**12)
    assert est.total_bytes > 0


def test_joined_query_sums_relations(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    est = estimate_scan_bytes(li.join(o, li.l_orderkey == o.o_orderkey))
    assert len(est.relations) == 2
    assert est.total_bytes == sum(r.scan_bytes for r in est.relations)
