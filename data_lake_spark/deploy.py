"""Cluster deployment sizing: turn a data scale into Spark conf.

Everything in this repo runs unchanged from ``spark-submit`` on a real
cluster (session.py only sets ``local[]`` when no master is configured).
What DOES change with scale is sizing, and guessing it is how 100 TB jobs
die. This module encodes the arithmetic:

- **Shuffle partitions** target ~``SHUFFLE_TARGET_BYTES`` (128 MiB) of
  pre-shuffle data each — large enough to amortize task overhead, small
  enough to sort/aggregate in executor memory without spill. Floor at
  2 tasks per core so a wave of stragglers can't idle the cluster; AQE
  coalesces the excess at runtime, so erring high is cheap.
- **Input split size** (``maxPartitionBytes``) stays at 256 MiB: scans
  are streaming, so bigger splits amortize scheduling without the memory
  pressure shuffles have.
- **Dynamic allocation + speculation** on: a 1000-executor job WILL lose
  executors; the job must reclaim and re-attempt, not hang on the last
  0.1% of tasks.

These are defaults to hand to spark-submit --conf, not session.py
overrides — the local test/bench path keeps its own sizing.
"""

from __future__ import annotations

TB = 1024**4
SHUFFLE_TARGET_BYTES = 128 * 1024**2
INPUT_SPLIT_BYTES = 256 * 1024**2


def recommended_cluster_conf(
    input_bytes: int,
    executors: int = 1000,
    cores_per_executor: int = 4,
    shuffle_fraction: float = 0.5,
) -> dict[str, str]:
    """Spark conf for a batch over ``input_bytes`` of source data.

    ``shuffle_fraction`` is the expected shuffle volume relative to the
    input (0.5 is conservative for this engine: every headline plan
    aggregates or filters before its widest shuffle — see PLANS.md).
    """
    total_cores = executors * cores_per_executor
    shuffle_bytes = int(input_bytes * shuffle_fraction)
    partitions = max(
        shuffle_bytes // SHUFFLE_TARGET_BYTES,
        2 * total_cores,
    )
    return {
        "spark.sql.shuffle.partitions": str(partitions),
        "spark.sql.files.maxPartitionBytes": str(INPUT_SPLIT_BYTES),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            SHUFFLE_TARGET_BYTES
        ),
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.maxExecutors": str(executors),
        "spark.dynamicAllocation.shuffleTracking.enabled": "true",
        "spark.speculation": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }


def spark_submit_args(conf: dict[str, str]) -> list[str]:
    """Render a conf dict as spark-submit arguments."""
    out: list[str] = []
    for k, v in sorted(conf.items()):
        out.extend(["--conf", f"{k}={v}"])
    return out
