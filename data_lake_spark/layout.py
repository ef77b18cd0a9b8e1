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
    """(relative_dir, bytes) of every parquet data file under ``root``,
    via the Hadoop FileSystem API — works on any scheme (file/HDFS/S3),
    never driver-local os.walk. The relative dir is computed from the
    FS-QUALIFIED root (``fs.makeQualified``), so the caller's spelling
    (``file:///x`` vs ``file:/x`` vs ``/x``) never leaks into partition
    identity."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(root)
    fs = p.getFileSystem(conf)
    qroot = fs.makeQualified(p).toString().rstrip("/")
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if name.endswith(".parquet"):
            rel = name[len(qroot):].lstrip("/")
            out.append((rel.rsplit("/", 1)[0] if "/" in rel else "", int(st.getLen())))
    return out


# Spark/Hive writes NULL partition values as this sentinel directory
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _parse_partition_dir(rel: str, partition_cols: list[str]) -> list:
    """Decode a ``k1=v1/k2=v2`` directory suffix into the partition
    VALUES (None for the Hive null sentinel), unescaping Hive's %xx
    encoding of special characters — matching on decoded values, not
    directory strings, is what keeps 'a b'/NULL/timestamp partitions
    compactable."""
    from urllib.parse import unquote

    vals: dict[str, object] = {}
    for piece in rel.split("/"):
        if "=" not in piece:
            continue
        k, v = piece.split("=", 1)
        vals[k] = None if v == _HIVE_NULL else unquote(v)
    return [vals.get(c) for c in partition_cols]


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
    by_dir: dict[str, list[int]] = {}
    for rel, size in _list_parquet_files(spark, root):
        # partition identity = the k1=v1/k2=v2 suffix between the table
        # root and the file ("" for an unpartitioned table)
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
      (``src_root``) — no data read to plan. The directory names are
      DECODED (Hive %xx unescaping, NULL sentinel → null) and matched
      against the partition columns' values with null-safe equality, so
      escaped values ('a b', timestamps) and null partitions plan
      correctly instead of silently falling back to one file;
    - a salt column ``pmod(rowkey + dup_idx, n_target)`` splits each
      partition's rows across its target files, where ``rowkey`` is a
      content hash of the FULL row (xxhash64 of its JSON projection —
      JSON so map/binary columns don't break F.hash) and ``dup_idx`` is
      a row_number within identical-row groups. Content + counter keeps
      the salt DETERMINISTIC under task retries — a positional salt
      (hash of monotonically_increasing_id) recomputes differently
      after a shuffle-fetch failure and can duplicate or drop rows in
      the rewrite, the same hazard SPARK-23207 fixed for round-robin
      repartition. The counter also keeps exact-duplicate-heavy
      partitions splitting by volume (a bare content hash would send
      every copy to one file); identical rows swapping counters across
      retries yields the same (row, salt) multiset, so the output is
      retry-stable. Cost: the counter window adds one exchange on
      (partition, rowkey) before the placement exchange — the price of
      retry-determinism for a job that must be bit-exact;
    - rows are bit-identical to the input (pure rewrite), only the file
      layout changes.

    Returns {partition_dir: n_target}. Write is overwrite-to-``dst``
    (publish-then-swap — the safe pattern; compact-in-place belongs to
    table formats with atomic commit)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    rep = compaction_report(spark, src_root, target_bytes).collect()
    targets = {r.partition: int(r.n_target) for r in rep}
    rowkey = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    if not partition_cols:
        n = max(targets.get("", 1), 1)
        dup_idx = F.row_number().over(
            Window.partitionBy("__rowkey").orderBy("__rowkey")
        )
        (
            df.withColumn("__rowkey", rowkey)
            # reduce BEFORE adding the duplicate counter: __rowkey spans
            # the full int64 range, and ANSI mode (Spark 4 default) turns
            # a rowkey within dup_idx of Long.MAX into ARITHMETIC_OVERFLOW
            # that kills the whole compaction job; pmod-then-add is
            # overflow-free and keeps the same deterministic salt multiset
            .withColumn(
                "__salt",
                F.pmod(
                    F.pmod(F.col("__rowkey"), F.lit(n)) + dup_idx, F.lit(n)
                ),
            )
            .repartition(n, F.col("__salt"))
            .drop("__rowkey", "__salt")
            .write.mode("overwrite")
            .parquet(dst)
        )
        return targets
    map_rows = [
        tuple(_parse_partition_dir(k, partition_cols)) + (v,)
        for k, v in targets.items()
    ]
    mapping = spark.createDataFrame(
        map_rows,
        ", ".join(f"__p_{c} string" for c in partition_cols)
        + ", __n_target long",
    )
    cond = None
    for c in partition_cols:
        eq = df[c].cast("string").eqNullSafe(F.col(f"__p_{c}"))
        cond = eq if cond is None else (cond & eq)
    dup_idx = F.row_number().over(
        Window.partitionBy(*partition_cols, "__rowkey").orderBy("__rowkey")
    )
    salted = (
        df.join(F.broadcast(mapping), cond, "left")
        .withColumn("__rowkey", rowkey)
        .withColumn(
            "__salt",
            # same overflow-free pmod-then-add as the unpartitioned branch
            F.pmod(
                F.pmod(
                    F.col("__rowkey"),
                    F.coalesce(F.col("__n_target"), F.lit(1)),
                )
                + dup_idx,
                F.coalesce(F.col("__n_target"), F.lit(1)),
            ),
        )
        .drop("__rowkey", "__n_target", *[f"__p_{c}" for c in partition_cols])
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
