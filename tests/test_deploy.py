"""Cluster sizing arithmetic (deploy.py): shuffle partitions track data
volume with a per-core floor, and the rendered submit args are valid."""

from __future__ import annotations

from data_lake_spark.deploy import (
    SHUFFLE_TARGET_BYTES,
    TB,
    recommended_cluster_conf,
    spark_submit_args,
)


def test_partitions_scale_with_data():
    small = recommended_cluster_conf(1 * TB)
    big = recommended_cluster_conf(100 * TB)
    p_small = int(small["spark.sql.shuffle.partitions"])
    p_big = int(big["spark.sql.shuffle.partitions"])
    assert p_big > p_small
    # 100 TB * 0.5 shuffle fraction / 128 MiB target
    assert p_big == (100 * TB // 2) // SHUFFLE_TARGET_BYTES


def test_core_floor_dominates_small_jobs():
    conf = recommended_cluster_conf(
        10 * 1024**3, executors=1000, cores_per_executor=4
    )
    assert int(conf["spark.sql.shuffle.partitions"]) == 2 * 1000 * 4


def test_submit_args_render():
    conf = recommended_cluster_conf(1 * TB)
    args = spark_submit_args(conf)
    assert args[0] == "--conf"
    assert len(args) == 2 * len(conf)
    assert all("=" in a for a in args[1::2])


def test_conf_values_are_strings():
    conf = recommended_cluster_conf(100 * TB)
    assert all(isinstance(v, str) for v in conf.values())
