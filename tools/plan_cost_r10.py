#!/usr/bin/env python
"""Split each query's wall time into DRIVER-side plan/optimize time vs
execution (guide §1: know where the time goes before changing code).

For tiny sf data the collect() cost is planning + scheduling + compute;
this tool times (a) fn() construction, (b) queryExecution.executedPlan
(analysis+optimization+physical planning), (c) the full collect.

Usage: python tools/plan_cost_r10.py q1,q2,...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from data_lake_spark.queries import full_registry
    from data_lake_spark.session import get_spark

    spark = get_spark("plan-cost-r10")
    reg = full_registry()

    import glob

    for p in glob.glob(os.path.join(sf, "*.parquet")):
        spark.read.parquet(p).count()
    tiny = spark.range(1000)
    tiny.mapInPandas(lambda it: it, schema="id long").count()

    print(f"{'query':32s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        name = name.strip()
        fn = reg[name].fn
        fn(spark, sf).collect()  # warm
        # build + plan + execute measured separately on fresh frames
        t0 = time.perf_counter()
        df = fn(spark, sf)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        rows = df.collect()
        t3 = time.perf_counter()
        print(
            f"{name:32s} {t1-t0:7.3f} {t2-t1:7.3f} {t3-t2:7.3f} {t3-t0:7.3f}"
            f"  ({len(rows)} rows)"
        )


if __name__ == "__main__":
    main()
