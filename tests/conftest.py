from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Test-session sizing (r11, VERDICT item 3): the 880-test suite runs
# tiny data (sf0.001) through thousands of small Spark jobs, so its
# wall time is TASK SCHEDULING, not compute — measured end to end,
# local[8]/8 shuffle partitions runs the identical suite 2.2× faster
# than local[32]/32 (22 min vs ~50 min on the same machine). The bench
# keeps its own contract (master local[$SPARK_GRAFT_CPUS] in bench.py,
# untouched); tests are a correctness gate, not a throughput
# measurement, and every operator stays partition-count-agnostic (the
# property suite pins order/partitioning independence separately).
# Override with SPARK_GRAFT_TEST_CPUS when hunting a parallelism-
# sensitive bug.
_TEST_CPUS = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
os.environ["SPARK_GRAFT_CPUS"] = _TEST_CPUS
os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", _TEST_CPUS)


@pytest.fixture(scope="session")
def spark():
    from data_lake_spark.session import get_spark

    s = get_spark("data_lake_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
