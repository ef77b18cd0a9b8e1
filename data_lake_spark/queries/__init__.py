"""Named query registry — the driver-facing surface.

Each module contributes ``REGISTRY: dict[name, QuerySpec]`` entries; a
QuerySpec pairs the Spark implementation with the equivalent DuckDB oracle
SQL (or ``None`` for non-SQL-expressible operators, which get rows-only
checks). ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views
over this.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One driver-checkable query: Spark impl + DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


def full_registry() -> dict[str, QuerySpec]:
    from data_lake_spark.queries import (
        api_queries,
        corpus_q,
        curation,
        curation2,
        dq_q,
        entity_q,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        llm6,
        llm7,
        llm8,
        llm9,
        llm10,
        llm11,
        llm12,
        mleval_q,
        quality_q,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        retrieval_q,
        sketches,
        sketches2,
        sqlcompat_q,
        temporal,
        temporal2,
        temporal3,
        temporal4,
        train_q,
        tsmon_q,
    )

    reg: dict[str, QuerySpec] = {}
    reg.update(relational.REGISTRY)
    reg.update(relational2.REGISTRY)
    reg.update(relational3.REGISTRY)
    reg.update(relational4.REGISTRY)
    reg.update(relational5.REGISTRY)
    reg.update(curation.REGISTRY)
    reg.update(curation2.REGISTRY)
    reg.update(dq_q.REGISTRY)
    reg.update(sketches.REGISTRY)
    reg.update(sketches2.REGISTRY)
    reg.update(llm.REGISTRY)
    reg.update(llm2.REGISTRY)
    reg.update(llm3.REGISTRY)
    reg.update(llm4.REGISTRY)
    reg.update(llm5.REGISTRY)
    reg.update(llm6.REGISTRY)
    reg.update(llm7.REGISTRY)
    reg.update(llm8.REGISTRY)
    reg.update(llm9.REGISTRY)
    reg.update(llm10.REGISTRY)
    reg.update(llm11.REGISTRY)
    reg.update(llm12.REGISTRY)
    reg.update(mleval_q.REGISTRY)
    reg.update(quality_q.REGISTRY)
    reg.update(entity_q.REGISTRY)
    reg.update(temporal.REGISTRY)
    reg.update(temporal2.REGISTRY)
    reg.update(temporal3.REGISTRY)
    reg.update(temporal4.REGISTRY)
    reg.update(train_q.REGISTRY)
    reg.update(tsmon_q.REGISTRY)
    reg.update(api_queries.REGISTRY)
    reg.update(sqlcompat_q.REGISTRY)
    reg.update(retrieval_q.REGISTRY)
    reg.update(corpus_q.REGISTRY)

    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        if name in reg:
            ordered[name] = reg[name]
    for name, spec in reg.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


# The driver oracle-checks the first 50 registry entries per round. Window
# history: r01 = first 50 in module order; r02 = the 45 then-unchecked + 2
# fresh sketches + 3 sentinels; r03 = the 19 never-checked late-r02 additions
# + 28 r01 regression canaries + 3 r02 sentinels; r04 = the 8 round-3
# additions + 17 r01-stale + 25 oldest r02-only. r04 scored 49/50 green —
# the one red was doc_embed, whose array<long> column broke the driver's
# pandas canonicalizer (values were oracle-correct; output is now a CSV
# string and the plan census forbids non-scalar oracle-paired output).
#
# Round 7 (this list; blocks computed from CORRECTNESS_r01–r06 latest-green
# rounds, recomputed this session — r03-stale: 16, r04-stale: 49,
# r05-green: 50, r06-green: 50):
# (a) round-7 additions — first driver row THIS round (keep current as
#     they land);
# (b) the 16 displaced r03-green (d)-tail rows from the round-6 rotation
#     — the oldest verdicts in the registry (last green row four rounds
#     back): ntile_deciles … weekly_agg, alphabetical;
# (c) the 49 r04-stale rows in their CORRECTNESS_r04 window order
#     (oldest-first discipline): rank 50 cuts inside this block; each
#     round-7 addition in (a) displaces one row off this tail into the
#     ROUND 8 TODO.
#
# ROUND 8 TODO (computed from this round's FINAL window: 10 additions
# + 16 r03-stale + 24 r04-stale = 50; rank 50 cuts block (c) after its
# 24th row, `lang_id` — verified against the live full_registry()
# ordering): lead with the 25 displaced (c)-tail rows, still r04-green
# and the oldest verdicts in the registry by r08 — simhash cosine_topk
# winnow_fingerprint ann_lsh ivf_assign ivf_search dedup_clusters
# ann_multiprobe bpe_tokens embedding_neardup multimodal_decode
# frame_sample length_band_join quality_quantile_filter vocab_stats
# seq_pack pii_redact tfidf_topterms kmeans_refine classifier_filter
# chunk_docs stratified_sample embedding_quantize quality_report
# session_stats — then the 50 r05-stale rows oldest-first (recompute
# the exact list from CORRECTNESS_r07 at round start, the standing
# discipline); round-8 additions slot in at the top as they land, each
# displacing one r04-stale row into the ROUND 9 TODO.
_DRIVER_WINDOW_PRIORITY = [
    # (a) round-7 additions — first driver row this round (keep current;
    # appended as they land)
    "pii_scan",
    "url_domains",
    "html_strip",
    "embedding_norms",
    "image_dhash_pairs",
    "mixture_audit",
    "vocab_prune",
    "ngram_coverage",
    "embedding_pca",
    "bpe_encode_stored",
    # (b) the 16 r03-stale rows displaced by the round-6 additions —
    # oldest verdicts in the registry
    "ntile_deciles",
    "or_key_join",
    "pagination",
    "percentile_report",
    "profile_orders",
    "rank_models",
    "ratio_profitability",
    "repetition_stats",
    "revenue_by_region",
    "rollup_report",
    "shingle_pairs",
    "text_stats",
    "top5_distribution",
    "topk_per_group",
    "trailing_7d",
    "weekly_agg",
    # (c) the 49 r04-stale rows, CORRECTNESS_r04 window order — rank 50
    # cuts inside this block; the displaced tail goes to the ROUND 8 TODO
    "ivf_stored",
    "ivf_pq_stored",
    "semantic_dedup",
    "semantic_dedup_capped",
    "ann_recall",
    "classifier_train",
    "doc_topk",
    "proj_filter_compute",
    "or_filter_dim",
    "point_lookup",
    "global_sum",
    "date_parts",
    "json_payload",
    "string_funcs",
    "array_funcs",
    "set_ops_halves",
    "cube_report",
    "semi_join_active",
    "anti_join_inactive",
    "running_total",
    "hash_sample",
    "train_split",
    "mom_change",
    "lang_id",
    "simhash",
    "cosine_topk",
    "winnow_fingerprint",
    "ann_lsh",
    "ivf_assign",
    "ivf_search",
    "dedup_clusters",
    "ann_multiprobe",
    "bpe_tokens",
    "embedding_neardup",
    "multimodal_decode",
    "frame_sample",
    "length_band_join",
    "quality_quantile_filter",
    "vocab_stats",
    "seq_pack",
    "pii_redact",
    "tfidf_topterms",
    "kmeans_refine",
    "classifier_filter",
    "chunk_docs",
    "stratified_sample",
    "embedding_quantize",
    "quality_report",
    "session_stats",
]
