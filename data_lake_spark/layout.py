"""Physical layout control: multi-column data clustering (z-order).

Partition pruning (io.py partitioned sinks) skips whole directories on
the partition column; it does nothing for a second filter column. The
lakehouse answer is z-ordering: sort the data by the interleaved bits
(Morton code) of several columns before writing, so every file covers a
small rectangle of the (a, b) key space and a reader with file-level
min/max statistics (parquet row-group stats, Delta/Iceberg file stats)
skips most files for a point or range filter on EITHER column.

The reference relies on Athena scanning partitioned prefixes only
(data-lake-stack.yml bytes-scanned cutoff is its defense against full
scans); z-order is what keeps that cutoff satisfiable at 100 TB with
multi-dimensional predicates.

Everything is JVM bit arithmetic inside whole-stage codegen — no UDF —
and the write is one range repartition (sampled range exchange) + local
sort, the same cost as any global sort-write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton (z-curve) code: a's bit i lands at 2i, b's at
    2i+1. Locality along the code ≈ locality in both inputs."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def rank_normalize(df: DataFrame, col: str, bits: int = 16) -> DataFrame:
    """Map an arbitrary orderable numeric column onto [0, 2^bits) by
    equi-depth binning so Morton interleaving weights both dimensions
    evenly regardless of their native ranges. Adds ``<col>__z`` (long).

    Implementation is scale-safe: ``approxQuantile`` computes up to 1024
    bin boundaries in one distributed pass (Greenwald-Khanna sketch —
    never a global sort), the boundary array ships as a literal, and the
    per-row bin is a counting fold over it inside codegen. A global
    ``percent_rank`` window would funnel the whole table through one
    reducer at write time — exactly the single-reducer pattern
    operators/ranking.py exists to avoid. Rank resolution is capped at
    1024 equi-depth bins (then rescaled to the ``bits`` range): file
    skipping only needs resolution ~n_files, orders of magnitude below
    the cap."""
    n_bins = min(2**bits, 1024)
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.stat.approxQuantile(col, probs, 0.001)
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    bin_idx = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(F.col(col).cast("double") >= b, F.lit(1)).otherwise(F.lit(0)),
    )
    scale = (2**bits) // n_bins
    return df.withColumn(
        f"{col}__z",
        F.least(bin_idx * F.lit(scale), F.lit(2**bits - 1)).cast("long"),
    )


def _list_parquet_files(spark, root: str) -> list[tuple[str, int]]:
    """(path, bytes) of every parquet data file under ``root``, via the
    Hadoop FileSystem API — works on any scheme (file/HDFS/S3), never
    driver-local os.walk."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(root)
    fs = p.getFileSystem(conf)
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if name.endswith(".parquet"):
            out.append((name, int(st.getLen())))
    return out


def compaction_report(
    spark, root: str, target_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Per-partition-directory small-file diagnosis: (partition, n_files,
    total_bytes, avg_bytes, n_target) where n_target = ceil(bytes /
    target). The pre-flight read before :func:`compact_partitions` — at
    100 TB the metadata listing is the only cost; nothing reads data.
    A healthy table has n_files ≈ n_target; n_files ≫ n_target is the
    small-file problem (per-file open/seek overhead, starved scan
    parallelism granularity, NameNode/S3-listing pressure)."""
    import os as _os

    by_dir: dict[str, list[int]] = {}
    for path, size in _list_parquet_files(spark, root):
        # partition identity = the k1=v1/k2=v2 suffix between the table
        # root and the file ("" for an unpartitioned table)
        rel = _os.path.dirname(path).split(root.rstrip("/"), 1)[-1].strip("/")
        by_dir.setdefault(rel, []).append(size)
    rows = []
    for d in sorted(by_dir):
        sizes = by_dir[d]
        total = sum(sizes)
        rows.append(
            (
                d,
                len(sizes),
                total,
                total // len(sizes),
                max(1, -(-total // target_bytes)),
            )
        )
    return spark.createDataFrame(
        rows,
        "partition string, n_files long, total_bytes long, "
        "avg_bytes long, n_target long",
    )


def compact_partitions(
    df: DataFrame,
    dst: str,
    partition_cols: list[str],
    src_root: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a partitioned dataset with ≈``target_bytes`` files: each
    partition's rows land in ``ceil(partition_bytes / target)`` output
    files. The compaction job every lakehouse runs nightly (Delta
    OPTIMIZE / Iceberg rewrite_data_files), expressed as one Spark job:

    - per-partition target file counts come from the METADATA listing
      (``src_root``) — no data read to plan;
    - a salt column ``pmod(hash(*all columns), n_target)`` splits each
      partition's rows across its target files; the single shuffle is a
      repartition on (partition, salt), so every task holds whole
      output files and writes each exactly once;
    - rows are bit-identical to the input (pure rewrite), only the file
      layout changes.

    Returns {partition_value: n_target}. Write is overwrite-to-``dst``
    (publish-then-swap — the safe pattern; compact-in-place belongs to
    table formats with atomic commit)."""
    spark = df.sparkSession
    rep = compaction_report(spark, src_root, target_bytes).collect()
    targets = {r.partition: int(r.n_target) for r in rep}
    mapping = spark.createDataFrame(
        [(k, v) for k, v in targets.items()],
        "__pval string, __n_target long",
    )
    pcol = F.concat_ws(
        "/", *[F.concat(F.lit(f"{c}="), F.col(c).cast("string")) for c in partition_cols]
    )
    salted = (
        df.join(
            F.broadcast(mapping), pcol == F.col("__pval"), "left"
        )
        .withColumn(
            "__salt",
            F.pmod(
                F.hash(*[F.col(c) for c in df.columns]),
                F.coalesce(F.col("__n_target"), F.lit(1)),
            ),
        )
        .drop("__pval", "__n_target")
    )
    n_tasks = max(sum(targets.values()), 1)
    (
        salted.repartition(n_tasks, *partition_cols, F.col("__salt"))
        .drop("__salt")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(dst)
    )
    return targets


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of two columns:
    range-repartition by Morton code (sampled range exchange → files =
    contiguous code ranges), sort within partitions, drop the helper
    column. Files then have tight min/max envelopes on BOTH columns, so
    stat-based readers skip all but the matching rectangle."""
    coded = df.withColumn("__z", morton_code(*cols, bits=bits))
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
