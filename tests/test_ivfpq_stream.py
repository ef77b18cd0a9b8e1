"""Streaming IVF-PQ index maintenance: micro-batches of vectors land in
a cell-partitioned CODES index (m small ints per vector, no raw
vectors); codes match the batch-face encode and probe reads prune to
cell directories."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.kmeans import _elems, assign_cells, hash_seeds
from data_lake_spark.operators.pq import pq_codebook_lit, pq_codes_array
from data_lake_spark.streaming.incremental import start_ivfpq_index_ingest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_streaming_ivfpq_index(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    centroids = hash_seeds(emb, k=4)
    codebook = pq_codebook_lit(emb, m=4, k=8)

    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "src")
    now = time.time()
    for i, b in enumerate([b1, b2]):
        before = set(glob.glob(src + "/*.parquet"))
        b.coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(src + "/*.parquet")) - before:
            os.utime(f, (now - 60 + 30 * i,) * 2)

    idx_root = str(tmp_path / "index")
    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = start_ivfpq_index_ingest(
        stream, idx_root, centroids, codebook,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    index = spark.read.parquet(idx_root)
    assert index.count() == emb.count()  # every vector indexed once
    # the index stores CODES, not vectors (batch_id = per-batch overwrite dir)
    assert set(index.columns) == {"vec_id", "codes", "cell", "batch_id"}

    # codes match the batch-face encode against the same codebook
    values, present, subdim = codebook
    batch_codes = {
        r.vec_id: list(r.codes)
        for r in pq_codes_array(emb, values, present, subdim).collect()
    }
    got = {r.vec_id: list(r.codes) for r in index.collect()}
    assert got == batch_codes

    # cell assignments match the batch face too
    batch_cells = {
        r.vec_id: r.cell
        for r in assign_cells(
            _elems(emb, "vec_id", "embedding"), centroids, "vec_id"
        ).collect()
    }
    assert {r.vec_id: r.cell for r in index.collect()} == batch_cells

    # probe-side pruning: a one-cell read touches only that partition
    probed = spark.read.parquet(idx_root).filter(F.col("cell") == 0)
    files = [
        r[0] for r in probed.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("cell=0" in f for f in files)

    # crash-replay idempotency: reprocessing the same source from a fresh
    # checkpoint (same deterministic file->batch mapping) overwrites the
    # same batch_id dirs — the index must NOT grow duplicate code rows
    q2 = start_ivfpq_index_ingest(
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        idx_root,
        centroids,
        codebook,
        checkpoint=str(tmp_path / "ckpt_replay"),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    replayed = spark.read.parquet(idx_root)
    assert replayed.count() == emb.count()
    assert {r.vec_id: list(r.codes) for r in replayed.collect()} == batch_codes


def test_query_served_from_streamed_index(spark, tmp_path):
    """The full loop: micro-batched ingest maintains the cell-partitioned
    codes index; ivf_pq_topk_indexed then serves top-k from THAT index
    (plus the same fixed centroids/codebook artifacts) and must return
    exactly what it returns on a batch-built index of the same corpus."""
    from pyspark.sql import functions as F

    from data_lake_spark.operators.pq import ivf_pq_topk_indexed
    from data_lake_spark.streaming.incremental import start_ivfpq_index_ingest

    emb = load_table(spark, SF, "embeddings")
    centroids = hash_seeds(emb, k=4)
    codebook = pq_codebook_lit(emb, m=4, k=8)

    src = str(tmp_path / "src")
    emb.coalesce(2).write.parquet(src)
    idx_root = str(tmp_path / "index")
    q = start_ivfpq_index_ingest(
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        idx_root,
        centroids,
        codebook,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def topk(index):
        return sorted(
            (r.query_id, r.rk, r.cand_id, r.approx_dot)
            for r in ivf_pq_topk_indexed(
                emb, [0, 1, 2], index, codebook, centroids, k_top=3, n_probe=2
            ).collect()
        )

    streamed = topk(spark.read.parquet(idx_root))
    values, present, subdim = codebook
    batch_index = pq_codes_array(emb, values, present, subdim).join(
        assign_cells(_elems(emb, "vec_id", "embedding"), centroids, "vec_id")
        .select("vec_id", "cell"),
        "vec_id",
    )
    assert streamed == topk(batch_index)
    assert len(streamed) == 9  # 3 queries x top-3


def test_reingested_vector_scores_once(spark):
    """A vector re-embedded in a later batch exists in two batch_id
    partitions; the indexed query must score only its LATEST codes —
    never sum both batches' LUT rows into a doubled approx_dot."""
    from pyspark.sql import functions as F

    from data_lake_spark.operators.pq import ivf_pq_topk_indexed

    emb = load_table(spark, SF, "embeddings")
    centroids = hash_seeds(emb, k=4)
    codebook = pq_codebook_lit(emb, m=4, k=8)
    values, present, subdim = codebook
    base = pq_codes_array(emb, values, present, subdim).join(
        assign_cells(_elems(emb, "vec_id", "embedding"), centroids, "vec_id")
        .select("vec_id", "cell"),
        "vec_id",
    )
    # batch 0 = whole corpus; batch 1 = vectors 10..19 re-ingested with
    # identical codes (the duplicate-sum trap: same rows twice)
    dup = base.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    staged = base.withColumn("batch_id", F.lit(0)).unionByName(
        dup.withColumn("batch_id", F.lit(1))
    )
    clean = {
        (r.query_id, r.rk, r.cand_id, r.approx_dot)
        for r in ivf_pq_topk_indexed(
            emb, [0, 1, 2], base, codebook, centroids, k_top=3, n_probe=2
        ).collect()
    }
    deduped = {
        (r.query_id, r.rk, r.cand_id, r.approx_dot)
        for r in ivf_pq_topk_indexed(
            emb, [0, 1, 2], staged, codebook, centroids, k_top=3, n_probe=2
        ).collect()
    }
    assert deduped == clean


def test_codes_elems_dedups_batches(spark):
    """codes_elems must apply the same latest-batch dedup as the indexed
    path: a (vec_id, codes, batch_id) frame with a vector re-ingested in
    a later batch explodes to exactly one code row per (vec_id, s) —
    otherwise every ADC scorer fed by codes_elems double-sums it."""
    from pyspark.sql import functions as F

    from data_lake_spark.operators.pq import codes_elems

    emb = load_table(spark, SF, "embeddings")
    codebook = pq_codebook_lit(emb, m=4, k=8)
    values, present, subdim = codebook
    base = pq_codes_array(emb, values, present, subdim)
    dup = base.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    staged = base.withColumn("batch_id", F.lit(0)).unionByName(
        dup.withColumn("batch_id", F.lit(1))
    )
    plain = {
        (r.cand_id, r.s, r.code) for r in codes_elems(base).collect()
    }
    rows = codes_elems(staged).collect()
    assert len(rows) == len(plain)  # no doubled rows
    assert {(r.cand_id, r.s, r.code) for r in rows} == plain


def test_latest_batch_keeps_newest_values(spark):
    """latest_batch picks the HIGHEST batch_id's values per id (not just
    dropping duplicates), and is a no-op without a batch column."""
    from data_lake_spark.operators.upsert import latest_batch

    df = spark.createDataFrame(
        [(1, "old", 0), (1, "new", 1), (2, "only", 0)],
        "vec_id long, payload string, batch_id long",
    )
    got = {(r.vec_id, r.payload) for r in latest_batch(df, "vec_id").collect()}
    assert got == {(1, "new"), (2, "only")}
    no_batch = df.drop("batch_id")
    assert latest_batch(no_batch, "vec_id") is no_batch
