"""Lloyd-loop convergence + packing invariants (operators/kmeans.py,
operators/packing.py). The per-step codebook itself is oracle-checked by
the kmeans_refine query; here we check the iterative properties SQL
can't express."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.kmeans import kmeans_fit, lloyd_step
from data_lake_spark.operators.packing import pack_sequences

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_lloyd_inertia_non_increasing(spark):
    emb = load_table(spark, SF, "embeddings")
    _, inertia = kmeans_fit(emb, n_iter=3)
    assert len(inertia) == 3
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia


def test_lloyd_step_partitions_all_vectors(spark):
    emb = load_table(spark, SF, "embeddings")
    out = lloyd_step(emb)
    n_vecs = emb.count()
    got = out.groupBy("cell").agg(F.max("n_members").alias("n")).agg(
        F.sum("n")
    ).collect()[0][0]
    assert got == n_vecs  # every vector lands in exactly one cell
    dims = out.select("d").distinct().count()
    assert dims == 64


def test_kmeans_hash_seeded_labelfree(spark):
    from data_lake_spark.operators.kmeans import hash_seeds

    emb = load_table(spark, SF, "embeddings")
    seeds = hash_seeds(emb, k=5)
    assert seeds.select("cell").distinct().count() == 5
    _, inertia = kmeans_fit(emb, n_iter=3, seeds=seeds)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia
    # deterministic: same seeds on a different partitioning
    seeds2 = hash_seeds(emb.repartition(7), k=5)
    assert sorted(map(tuple, seeds.collect())) == sorted(map(tuple, seeds2.collect()))


def test_dedup_corpus_end_to_end(spark):
    from data_lake_spark.operators.textdedup import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for i in range(4):  # 4 near-identical copies (one-token tail change)
        rows.append((i, f"{base} v{i}"))
    rows.append((10, "completely different text about spark shuffles and joins ok"))
    rows.append((11, "another unrelated document discussing parquet footers and stats"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, stats = dedup_corpus(docs, min_jaccard=0.5)
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [0, 10, 11]  # min-id keeper per cluster + uniques
    assert stats["n_docs"] == 6 and stats["n_removed"] == 3
    # idempotent: deduping the deduped corpus removes nothing
    kept2, stats2 = dedup_corpus(kept, min_jaccard=0.5)
    assert stats2["n_removed"] == 0
    assert sorted(r.doc_id for r in kept2.collect()) == ids


def test_hot_band_cap_bounds_candidates(spark):
    """A boilerplate-heavy corpus (many identical docs) creates hot bands
    whose self-join is quadratic; max_band_size must bound the candidate
    count while leaving a normal corpus's candidates unchanged."""
    from data_lake_spark.operators.textdedup import minhash_lsh_pairs

    boiler = "this license header is identical across every single file here"
    rows = [(i, boiler) for i in range(30)]
    rows += [
        (100, "a genuinely unique document about adaptive query execution"),
        (101, "a genuinely unique document about adaptive query planning"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = minhash_lsh_pairs(docs).count()
    capped = minhash_lsh_pairs(docs, max_band_size=10).count()
    # 30 identical docs → 435 boilerplate pairs uncapped; the cap drops
    # the hot bands, bounding candidates at ~cap²/2 per band
    assert uncapped >= 435
    assert capped <= 10 * 9 // 2 * 4 + 10  # b=4 bands of ≤cap docs
    assert capped < uncapped

    # normal corpus: a generous cap changes nothing
    normal = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different text about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    plain = {tuple(r) for r in minhash_lsh_pairs(normal).collect()}
    with_cap = {
        tuple(r) for r in minhash_lsh_pairs(normal, max_band_size=100).collect()
    }
    assert plain == with_cap


def test_pack_sequences_contiguous(spark):
    df = spark.createDataFrame(
        [(i, "en", 700) for i in range(10)], "doc_id long, lang string, n_tokens long"
    )
    out = pack_sequences(
        df, budget=2048, group_cols=["lang"], order_cols=["doc_id"]
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # start offsets are the running sum; seq boundaries at 2048-token marks
    assert by_id[0].start_off == 0 and by_id[0].seq_id == 0
    assert by_id[2].start_off == 1400 and by_id[2].seq_id == 0
    assert by_id[3].start_off == 2100 and by_id[3].seq_id == 1
    # seq_id is non-decreasing in doc order within the group
    seqs = [by_id[i].seq_id for i in range(10)]
    assert seqs == sorted(seqs)
