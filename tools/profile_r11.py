#!/usr/bin/env python
"""Round-10 per-query profiler (guide §1): isolate each query with the
noop sink so the computation is timed, not the sink, and capture
explain("formatted") to plans/r11/<name>_<tag>.txt for the before/after
evidence the round's deliverables require.

Usage:
  python tools/profile_r11.py --tag before q1,q2,...     # profile + plans
  python tools/profile_r11.py --tag after q1,q2 --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated query names")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from data_lake_spark.queries import full_registry
    from data_lake_spark.session import get_spark

    spark = get_spark("profile-r11")
    reg = full_registry()
    plans_dir = os.path.join(REPO, "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    # warm-up mirrors bench.py: touch tables, hot codegen, spawn workers
    import glob

    for p in glob.glob(os.path.join(args.sf, "*.parquet")):
        spark.read.parquet(p).count()
    tiny = spark.range(1000)
    tiny.mapInPandas(lambda it: it, schema="id long").count()

    for name in args.names.split(","):
        name = name.strip()
        fn = reg[name].fn
        spark.sparkContext.setJobDescription(f"r11:{name}")
        df = fn(spark, args.sf)
        if not args.no_plans:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        # pass 1 warms (unmeasured), then measured noop-sink passes
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        noop = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
        coll = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            coll.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: noop min {min(noop):.3f}s ±{max(noop) - min(noop):.3f}"
            f" | collect min {min(coll):.3f}s ±{max(coll) - min(coll):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
