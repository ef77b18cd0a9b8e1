"""Z-order layout skippability, corrupt-record quarantine, and
watermark late-data semantics.

The z-order test measures the property stat-based readers exploit: after
clustering, each file's min/max envelope covers a small slice of BOTH
key columns, so a point/range filter on either column can skip most
files. A plain unsorted write is the control — its envelopes span
(nearly) the full domain, so nothing can be skipped.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_lake_spark.io import quarantine_corrupt, read_csv_robust
from data_lake_spark.layout import morton_code, write_zordered


def _envelopes(path: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of ``col`` from parquet row-group stats."""
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        out.append((min(mins), max(maxs)))
    return out


def _skippable(envs: list[tuple[int, int]], lo: int, hi: int) -> int:
    """Files a stats-aware reader skips for the predicate col∈[lo,hi]."""
    return sum(1 for mn, mx in envs if mx < lo or mn > hi)


def test_morton_code_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3), (5, 2)], "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", morton_code("a", "b", bits=4)).collect()
    }
    # bit-interleave ground truth: a bits at even positions, b at odd
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15
    assert got[(5, 2)] == 0b011001  # a=101 -> 1_0_1 at 0,2,4; b=010 -> 1 at 3


def test_zorder_tightens_file_envelopes(spark, tmp_path):
    n, side = 4096, 64  # uniform grid over (x, y) in [0, 64)^2
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(8).write.parquet(plain)
    write_zordered(df, zpath, cols=("x", "y"), n_files=8)

    # same data, same file count — only the layout differs
    ssum = spark.read.parquet(zpath).agg(F.sum("payload")).collect()[0][0]
    assert ssum == n * (n - 1) // 2

    q = (0, 15)  # a quarter-range predicate on either dimension
    for col in ("x", "y"):
        z_envs = _envelopes(zpath, col)
        p_envs = _envelopes(plain, col)
        assert _skippable(z_envs, *q) >= 4, (col, z_envs)  # most files skip
        assert _skippable(p_envs, *q) == 0, (col, p_envs)  # control: none


def test_csv_corrupt_record_quarantine(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,amount,d\n"
        "1,10.5,2024-01-01\n"
        "2,notanumber,2024-01-02\n"
        "3,30.0,2024-01-03\n"
    )
    df = read_csv_robust(
        spark, str(p), "id long, amount double, d string", mode="PERMISSIVE"
    )
    clean, bad = quarantine_corrupt(df)
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    assert bad.count() == 1
    assert "notanumber" in bad.collect()[0]._corrupt_record
    # DROPMALFORMED face: bad row silently gone
    dropped = read_csv_robust(
        spark, str(p), "id long, amount double, d string", mode="DROPMALFORMED"
    )
    # count() alone parses no columns (nothing to malform) — materialize
    assert len(dropped.collect()) == 2


def test_watermark_drops_late_data(spark, tmp_path):
    base = 1_700_000_000

    def _df(rows):
        return spark.createDataFrame(rows, "event_id long, ts long").withColumn(
            "ts", F.timestamp_seconds(F.col("ts"))
        )

    # Three micro-batches. A row behind the watermark is only dropped
    # once its window's state has been EVICTED (eviction runs at batch
    # end with that batch's starting watermark) — so the straggler must
    # arrive after the watermark-advancing batch, not with it.
    batches = [
        _df([(1, base + 10), (2, base + 20), (3, base + 30)]),  # window W
        _df([(9, base + 7200)]),  # raises max event time past W + delay
        # a batch runs with the watermark its PREDECESSOR established, so
        # W's state is emitted+evicted only during this third batch
        _df([(10, base + 7300)]),
        _df([(4, base + 40)]),  # straggler for W: behind watermark → dropped
    ]
    src = str(tmp_path / "src")
    # the file source orders micro-batches by mtime: pin them strictly
    # ascending (same-ms writes would tie-break on random part names)
    import os, time

    now = time.time()
    for i, b in enumerate(batches):
        before = set(glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f, (now - 100 + 50 * i, now - 100 + 50 * i))
    b1 = batches[0]

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("long").alias("w_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.w_start: r.n for r in spark.sql("SELECT * FROM late_out").collect()}
    finally:
        q.stop()
    # the first window finalized with 3 events; the straggler was dropped
    # (no merged count, no duplicate append row for the same window)
    first_window = base - base % 900
    assert got.get(first_window) == 3
    # batch face of the same plan counts all 4 — the difference IS the drop
    batch = (
        batches[0].unionAll(batches[1]).unionAll(batches[2]).unionAll(batches[3])
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("long").alias("w_start"), "n")
    )
    bgot = {r.w_start: r.n for r in batch.collect()}
    assert bgot.get(first_window) == 4


def test_rank_normalize_equidepth_no_window(spark):
    """rank_normalize bins an arbitrary-scaled float column into
    [0, 2^bits) equi-depth buckets with a distributed sketch + codegen
    fold — monotone in the input, bounded, roughly uniform occupancy,
    and (the scale property) no Window operator in the plan."""
    from data_lake_spark.layout import rank_normalize

    rows = [(i, float(i) ** 2 * 1e-3) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = rank_normalize(df, "v", bits=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    got = {r.id: r.v__z for r in out.collect()}
    assert all(0 <= z < 256 for z in got.values())
    # monotone: higher v never gets a lower bin
    zs = [got[i] for i in range(2000)]
    assert zs == sorted(zs)
    # equi-depth: every quartile of ids spans a distinct bin range
    assert zs[0] < zs[999] < zs[1999]


def test_compaction_report_and_rewrite(spark, tmp_path):
    """Small-file compaction: a fragmented partitioned table (20 files
    per partition) is diagnosed by compaction_report and rewritten to
    the per-partition target file count with bit-identical rows."""
    from data_lake_spark.layout import compact_partitions, compaction_report

    src = str(tmp_path / "frag")
    df = spark.range(0, 10_000).select(
        "id",
        (F.col("id") % 4).cast("string").alias("day"),
        (F.col("id") * 3).alias("v"),
    )
    # fragment: 20 shuffle partitions × 4 day dirs -> ~20 files per dir
    df.repartition(20).write.partitionBy("day").parquet(src)

    rep = {r.partition: r for r in compaction_report(spark, src, 10**9).collect()}
    assert len(rep) == 4
    for part, r in rep.items():
        assert part.startswith("day=")
        assert r.n_files >= 10  # genuinely fragmented
        assert r.n_target == 1  # tiny data, huge target -> one file each

    dst = str(tmp_path / "compact")
    back_in = spark.read.parquet(src)
    targets = compact_partitions(
        back_in, dst, ["day"], src_root=src, target_bytes=10**9
    )
    assert set(targets) == set(rep) and all(v == 1 for v in targets.values())

    # one data file per partition dir now
    for d in range(4):
        files = glob.glob(f"{dst}/day={d}/*.parquet")
        assert len(files) == 1, files
    # rows bit-identical (layout-only rewrite)
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compaction_splits_oversized_partition(spark, tmp_path):
    """A partition larger than target_bytes must split across
    ceil(bytes/target) files, not collapse to one."""
    from data_lake_spark.layout import compact_partitions, compaction_report

    src = str(tmp_path / "big")
    df = spark.range(0, 50_000).select(
        "id", F.lit("x").alias("part"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    df.repartition(16).write.partitionBy("part").parquet(src)
    total = sum(
        s for _, s in __import__(
            "data_lake_spark.layout", fromlist=["_list_parquet_files"]
        )._list_parquet_files(spark, src)
    )
    target = total // 3  # force n_target >= 3 (header overhead inflates a bit)
    rep = compaction_report(spark, src, target).collect()
    (row,) = rep
    assert row.n_target >= 3

    dst = str(tmp_path / "big_out")
    compact_partitions(
        spark.read.parquet(src), dst, ["part"], src_root=src, target_bytes=target
    )
    files = glob.glob(f"{dst}/part=x/*.parquet")
    # salt groups can hash-collide into one task (version-dependent), so
    # the hard floor is "genuinely split", the ceiling the planned count
    assert 2 <= len(files) <= row.n_target, files
    assert (
        spark.read.parquet(dst).count() == 50_000
    )


def test_compaction_handles_escaped_and_null_partitions(spark, tmp_path):
    """Partition values with Hive-escaped characters ('a b', 'x:y') and
    NULLs (__HIVE_DEFAULT_PARTITION__ dirs) must be planned and split
    like any other partition — the decoded-value null-safe join, not a
    raw directory-string match."""
    from pyspark.sql import Row

    from data_lake_spark.layout import compact_partitions, compaction_report

    src = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [Row(id=i, part=["a b", "x:y", None][i % 3]) for i in range(3000)]
    )
    df.repartition(10).write.partitionBy("part").parquet(src)

    rep = {r.partition: r for r in compaction_report(spark, src, 10**9).collect()}
    assert len(rep) == 3
    assert any("%20" in p or "a b" in p for p in rep)  # escaped dir listed
    assert any("__HIVE_DEFAULT_PARTITION__" in p for p in rep)

    dst = str(tmp_path / "esc_out")
    compact_partitions(
        spark.read.parquet(src), dst, ["part"], src_root=src, target_bytes=10**9
    )
    # every partition (escaped, colon, null) collapsed to ONE file
    out = {r.partition: r for r in compaction_report(spark, dst, 10**9).collect()}
    assert len(out) == 3
    for p, r in out.items():
        assert r.n_files == 1, (p, r)
    a = sorted((r.id, r.part) for r in spark.read.parquet(src).collect())
    b = sorted((r.id, r.part) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compaction_splits_duplicate_heavy_partition(spark, tmp_path):
    """Exact-duplicate rows must still spread across the planned file
    count (position salt, not content hash)."""
    import glob as _glob

    from data_lake_spark.layout import compact_partitions, compaction_report

    src = str(tmp_path / "dup")
    df = spark.range(0, 40_000).select(
        F.lit(7).alias("id"),
        F.lit("x").alias("part"),
        F.lit("A" * 200).alias("pad"),
    )
    df.repartition(8).write.partitionBy("part").parquet(src)
    total = compaction_report(spark, src, 10**9).collect()[0].total_bytes
    target = max(total // 3, 1)
    rep = compaction_report(spark, src, target).collect()[0]
    assert rep.n_target >= 3
    dst = str(tmp_path / "dup_out")
    compact_partitions(
        spark.read.parquet(src), dst, ["part"], src_root=src, target_bytes=target
    )
    files = _glob.glob(f"{dst}/part=x/*.parquet")
    assert len(files) >= 2, files  # identical rows no longer co-salted
    assert spark.read.parquet(dst).count() == 40_000
