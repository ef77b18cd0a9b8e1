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


def test_decontam_stage_drops_contaminated_survivors(spark, tmp_path):
    # a benchmark set drawn FROM the corpus: every bench doc's keeper
    # (or the doc itself) shares a verbatim run and must be dropped
    from data_lake_spark.catalog import load_table

    bench = (
        load_table(spark, SF, "documents")
        .filter("doc_id % 97 = 0")
        .select("doc_id", "text")
    )
    n_bench = bench.count()
    assert n_bench > 0
    s = pretrain_prepare(
        spark, SF, str(tmp_path / "clean"), tokens_per_shard=2000, bench=bench
    )
    assert s["n_raw"] >= s["n_gated"] >= s["n_kept"] >= s["n_clean"]
    assert s["n_clean"] < s["n_kept"]  # contamination is real here
    assert s["export"]["n_docs"] == s["n_clean"]
    # no exported doc shares a >=13-token verbatim run with the bench
    from data_lake_spark.operators.textdedup import decontam_spans

    back = spark.read.parquet(os.path.join(tmp_path / "clean", "data"))
    assert decontam_spans(back, bench, k=5, min_tokens=13).count() == 0


def test_final_pack_stage_shuffle_budget(spark):
    # the composed pipeline's last stage (token-budgeted packing) must
    # stay ONE exchange — the per-group running-sum window — at any
    # corpus size; pinned here like tests/test_plan_contracts.py pins
    # the registry queries (round-9 verdict #8)
    from data_lake_spark.catalog import load_table
    from data_lake_spark.operators.packing import pack_sequences

    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(
        docs, budget=2048, group_cols=["lang"], order_cols=["doc_id"]
    )
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan
