#!/usr/bin/env python
"""A/B `spark.io.compression.codec` (lz4 default vs zstd) on
shuffle-heavy queries at K× data (guide §2.3/§6; VERDICT r10 item 9).

The codec is a SparkContext-level setting, so the A/B runs one PROCESS
per (codec, round), alternating codecs across rounds to decorrelate VM
drift; compare per-query minima across rounds.

Usage:
  python tools/zstd_ab_r11.py build /tmp/corpus8x 8     # once
  python tools/zstd_ab_r11.py run /tmp/corpus8x lz4
  python tools/zstd_ab_r11.py run /tmp/corpus8x zstd
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# shuffle-heavy representatives: gram/shingle inverted indexes, banded
# self-joins, window rollups, hybrid retrieval, CC edge sets
QUERIES = [
    "minhash_lsh",
    "exact_substr",
    "exact_substr_pairs",
    "windowed_rollup",
    "tfidf_topterms",
    "rrf_fusion",
    "dedup_clusters",
    "video_clip_spans",
]


def main() -> None:
    mode, dst = sys.argv[1], sys.argv[2]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    from data_lake_spark.session import get_spark

    if mode == "build":
        k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from scale_check import _scale_corpus

        spark = get_spark("zstd-ab-build")
        _scale_corpus(spark, "/root/testdata/sf0.1", dst, k)
        print("built", dst)
        return

    codec = sys.argv[3]
    spark = get_spark(
        f"zstd-ab-{codec}", extra_conf={"spark.io.compression.codec": codec}
    )
    assert spark.conf.get("spark.io.compression.codec") == codec
    from data_lake_spark.queries import full_registry

    reg = full_registry()
    import glob

    for p in glob.glob(os.path.join(dst, "*.parquet")):
        spark.read.parquet(p).count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    out = {}
    for name in QUERIES:
        fn = reg[name].fn
        fn(spark, dst).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, dst).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts), 2)
        print(f"# {codec} {name}: {out[name]}", file=sys.stderr, flush=True)
    import json

    print(json.dumps({"codec": codec, "queries": out}))


if __name__ == "__main__":
    main()
