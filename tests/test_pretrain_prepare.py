"""pipelines.pretrain_prepare: the one-call corpus→shards integration —
monotone retention funnel, export totals equal to the dedup survivors,
dedup idempotence on the kept set, and shards that replay exactly."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_lake_spark.pipelines import pretrain_prepare

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def prepared(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("pretrain"))
    stats = pretrain_prepare(spark, SF, dst, tokens_per_shard=2000)
    return dst, stats


def test_funnel_is_monotone_and_consistent(prepared):
    _, s = prepared
    assert s["n_raw"] >= s["n_gated"] >= s["n_kept"] > 0
    assert s["n_verified_edges"] <= s["n_candidate_pairs"]
    assert s["export"]["n_docs"] == s["n_kept"]
    assert s["export"]["n_shards"] >= 1


def test_shards_contain_exactly_the_kept_docs(spark, prepared):
    dst, s = prepared
    back = spark.read.parquet(os.path.join(dst, "data"))
    assert back.count() == s["n_kept"]
    assert back.select("doc_id").distinct().count() == s["n_kept"]
    with open(os.path.join(dst, "_SUMMARY.json")) as fh:
        assert json.load(fh)["n_docs"] == s["n_kept"]


def test_dedup_is_idempotent_on_kept_set(spark, prepared):
    from data_lake_spark.operators.textdedup import dedup_corpus

    dst, s = prepared
    back = spark.read.parquet(os.path.join(dst, "data")).select(
        "doc_id", "text", "lang", "source", "n_tokens"
    )
    _, dd2 = dedup_corpus(back, min_jaccard=0.5)
    assert dd2["n_removed"] == 0


def test_quality_gate_actually_gates(spark, tmp_path):
    # max_tokens=0 gates out every document: an empty corpus is a
    # legitimate (if extreme) outcome — the funnel reports the zeros
    # honestly and the export writes an empty-but-valid artifact.
    stats = pretrain_prepare(
        spark, SF, str(tmp_path / "none"), max_tokens=0
    )
    assert stats["n_gated"] == 0 == stats["n_kept"]
    assert stats["export"]["n_shards"] == 0
    # empty export reports proper zeros, not SQL-NULL Nones
    assert stats["export"]["n_docs"] == 0 and stats["export"]["n_tokens"] == 0
