#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed end-to-end (plan + execute + materialize via
collect) after a session warm-up, so numbers reflect engine work, not JVM
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# The headline set: the flagship plus the operators that dominate real
# workloads (big join+agg, full-outer compare, two-level agg + window,
# union+pivot, window dedup, and the LLM-pipeline ops).
HEADLINE = [
    "earnings_by_day",
    "multi_agg_attrs",
    "full_outer_platforms",
    "dow_distribution",
    "top5_distribution",
    "earnings_series_pivot",
    "dedup_keep_latest",
    "exact_dedup",
    "text_stats",
    "simhash",
    "shingle_pairs",
    "cosine_topk",
    "bpe_tokens",
    "minhash_lsh",
    "ann_lsh",
    "embedding_neardup",
    "multimodal_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    from data_lake_spark.queries import full_registry
    from data_lake_spark.session import get_spark

    spark = get_spark("data_lake_spark-bench")
    reg = full_registry()

    # warm-up: touch the fact table so FS cache / codegen aren't billed
    # to the first query
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = reg[name].fn
        t0 = time.perf_counter()
        n = len(fn(spark, sf_dir).collect())
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
