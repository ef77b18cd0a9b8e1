"""Training-shard export: every doc lands exactly once, shard token
sums respect the contiguous-fill bound, the manifest digests match the
written data, and the export is deterministic on any input
partitioning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.export import export_training_shards

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
BUDGET = 2000


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("shards"))
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    summary = export_training_shards(
        docs, dst, tokens_per_shard=BUDGET,
        order_cols=["doc_id"], group_cols=["lang"],
    )
    return docs, dst, summary


def test_every_doc_lands_exactly_once(spark, exported):
    docs, dst, summary = exported
    back = spark.read.parquet(os.path.join(dst, "data"))
    assert back.count() == docs.count() == summary["n_docs"]
    assert back.select("doc_id").distinct().count() == docs.count()
    assert summary["n_tokens"] == docs.agg(F.sum("n_tokens")).collect()[0][0]


def test_shard_token_sums_respect_contiguous_fill_bound(spark, exported):
    docs, dst, summary = exported
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    back = spark.read.parquet(os.path.join(dst, "data"))
    sums = sorted(
        back.groupBy("lang", "shard_id").agg(F.sum("n_tokens").alias("t")).collect(),
        key=lambda r: (r.lang, r.shard_id),
    )
    by_lang: dict = {}
    for r in sums:
        by_lang.setdefault(r.lang, []).append((r.shard_id, r.t))
    for lang, shards in by_lang.items():
        # shard ids are contiguous from 0 (no empty shards in between)
        assert [sid for sid, _ in shards] == list(range(len(shards))), lang
        cum = 0
        for sid, t in shards:
            # a shard exceeds the budget only via its last straddling doc
            assert t < BUDGET + max_doc, (lang, sid, t)
            cum += t
            if sid < len(shards) - 1:
                # contiguous fill: shards 0..k must cover (k+1) budgets —
                # the boundary was reached before shard k+1 opened
                assert cum >= (sid + 1) * BUDGET, (lang, sid, cum)


def test_manifest_digests_match_rewritten_data(spark, exported):
    docs, dst, summary = exported
    from data_lake_spark.functions.checksum import row_hash

    content_cols = docs.columns
    back = spark.read.parquet(os.path.join(dst, "data"))
    recomputed = (
        back.withColumn("__h", row_hash(back, content_cols))
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.pmod(
                F.sum(F.col("__h").cast("decimal(38,0)")).cast("decimal(38,0)"),
                F.lit(str(1 << 64)).cast("decimal(38,0)"),
            ).cast("decimal(20,0)").alias("hash_sum"),
            F.bit_xor("__h").alias("hash_xor"),
        )
    )
    man = spark.read.json(os.path.join(dst, "manifest"))
    assert man.count() == summary["n_shards"]
    key = lambda r: (r["lang"], int(r["shard_id"]))
    got = {key(r): (int(r["n_docs"]), int(r["n_tokens"]), int(r["hash_sum"]), int(r["hash_xor"]))
           for r in man.collect()}
    want = {key(r): (int(r["n_docs"]), int(r["n_tokens"]), int(r["hash_sum"]), int(r["hash_xor"]))
            for r in recomputed.collect()}
    assert got == want


def test_summary_is_commit_point_and_totals_hold(exported):
    docs, dst, summary = exported
    with open(os.path.join(dst, "_SUMMARY.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk == summary
    assert summary["n_shards"] > 1  # budget actually split the corpus


def test_export_is_deterministic_across_partitionings(spark, tmp_path, exported):
    docs, dst, summary = exported
    dst2 = str(tmp_path / "shards2")
    summary2 = export_training_shards(
        docs.repartition(7), dst2, tokens_per_shard=BUDGET,
        order_cols=["doc_id"], group_cols=["lang"],
    )
    assert summary2 == summary


def test_reexport_into_same_dst_is_clean(spark, exported):
    """A re-export into an existing dst retracts the previous
    _SUMMARY.json before touching data (no stale commit marker over a
    half-written artifact) and lands the identical summary."""
    docs, dst, summary = exported
    summary2 = export_training_shards(
        docs, dst, tokens_per_shard=BUDGET,
        order_cols=["doc_id"], group_cols=["lang"],
    )
    assert summary2 == summary
    with open(os.path.join(dst, "_SUMMARY.json")) as fh:
        assert json.load(fh) == summary
