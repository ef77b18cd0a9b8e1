"""Parquet bloom filters for point lookups on hash-like keys.

The reference's upsert path probes one `(_id, date)` per record
(ingestStreamateModelPerformance.py:80-84). `_id` is effectively random, so
row-group min/max stats never prune — every row group spans the whole key
range. A written bloom filter lets the parquet reader skip non-matching
row groups outright. This test measures it: the scan's numOutputRows
(rows actually decoded, post row-group/page skipping, pre Spark filter)
must collapse with blooms and stay at full-table without them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_spark.io import Lake

N = 400_000
# small row groups so one file holds many (the skipping unit)
_SMALL_GROUPS = {"parquet.block.size": "131072"}


def _decoded_rows(spark, path: str, probe: str) -> int:
    q = spark.read.parquet(path).filter(F.col("k") == probe)
    q.collect()

    def find(node):
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            return find(node.executedPlan())
        leaves = node.collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            name = leaf.getClass().getSimpleName()
            if "FileSourceScan" in name:
                return leaf
            if name == "AdaptiveSparkPlanExec":
                hit = find(leaf.executedPlan())
                if hit is not None:
                    return hit
        return None

    leaf = find(q._jdf.queryExecution().executedPlan())
    it = leaf.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == "numOutputRows":
            return int(kv._2().value())
    raise AssertionError("scan metric not found")


def test_bloom_filter_skips_row_groups(spark, tmp_path):
    lake = Lake(spark, str(tmp_path))
    # md5 keys in insertion order: random per row group, uniform ranges.
    df = (
        spark.range(0, N)
        .withColumn("k", F.md5(F.col("id").cast("string")))
        .withColumn("v", F.col("id") * 2)
        .coalesce(1)
    )
    plain = lake.write(df, "silver", "plain", options=_SMALL_GROUPS)
    bloom = lake.write(
        df, "silver", "bloom", bloom_cols={"k": N}, options=_SMALL_GROUPS
    )

    probe = spark.read.parquet(plain).select("k").limit(1).collect()[0][0]
    decoded_plain = _decoded_rows(spark, plain, probe)
    decoded_bloom = _decoded_rows(spark, bloom, probe)
    assert decoded_plain == N  # stats can't prune random keys
    assert decoded_bloom < N // 20  # blooms skip non-matching row groups
