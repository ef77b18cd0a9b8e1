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
        curation,
        curation2,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        llm6,
        llm7,
        quality_q,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        sketches,
        sketches2,
        sqlcompat_q,
        temporal,
        temporal2,
        temporal3,
        temporal4,
    )

    reg: dict[str, QuerySpec] = {}
    reg.update(relational.REGISTRY)
    reg.update(relational2.REGISTRY)
    reg.update(relational3.REGISTRY)
    reg.update(relational4.REGISTRY)
    reg.update(relational5.REGISTRY)
    reg.update(curation.REGISTRY)
    reg.update(curation2.REGISTRY)
    reg.update(sketches.REGISTRY)
    reg.update(sketches2.REGISTRY)
    reg.update(llm.REGISTRY)
    reg.update(llm2.REGISTRY)
    reg.update(llm3.REGISTRY)
    reg.update(llm4.REGISTRY)
    reg.update(llm5.REGISTRY)
    reg.update(llm6.REGISTRY)
    reg.update(llm7.REGISTRY)
    reg.update(quality_q.REGISTRY)
    reg.update(temporal.REGISTRY)
    reg.update(temporal2.REGISTRY)
    reg.update(temporal3.REGISTRY)
    reg.update(temporal4.REGISTRY)
    reg.update(api_queries.REGISTRY)
    reg.update(sqlcompat_q.REGISTRY)

    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        if name in reg:
            ordered[name] = reg[name]
    for name, spec in reg.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


# The driver oracle-checks the first 50 registry entries per round. Round 1
# checked the first 50 in module order (all green); this list front-loads the
# 45 queries that fell outside that window, the 2 sketches (freshly
# oracle-ized), and 3 already-green sentinels to prove no regression — exactly
# 50. Everything else keeps its round-1-green status via module order below.
#
# ROUND 3 TODO: once CORRECTNESS_r02.json exists with these 50 green, rotate:
# replace this list with the 53 queries that will then lack an r02 row
# (the round-1-green set outside this window, plus the round-2 additions),
# front-loading at most 50 and keeping r02-green sentinels for the rest.
# Every query then has a driver-verified row in r01∪r02∪r03. The 53, in
# current registry order past position 50:
#   proj_filter_compute or_filter_dim point_lookup left_join_dim or_key_join
#   full_outer_platforms literal_dim_report global_sum weekly_agg
#   multi_agg_attrs avg_of_sums dow_distribution ratio_profitability
#   rank_models top5_distribution pagination earnings_series_pivot
#   dedup_keep_latest date_parts json_payload rollup_report running_total
#   mom_change topk_per_group cube_report semi_join_active
#   anti_join_inactive set_ops_halves string_funcs revenue_by_region
#   array_funcs grouping_sets_report trailing_7d profile_orders
#   ntile_deciles percentile_report bigram_lm_score hash_sample train_split
#   repetition_stats decontam mixture_weights text_stats lang_id
#   shingle_pairs line_dedup source_cap partial_overlap curation_funnel
#   athena_earnings_day athena_dow_dist athena_weekly athena_needle_period
# (r01-green ones among these double as proven-once sentinels; the 9 new
# round-2 queries — line_dedup source_cap partial_overlap curation_funnel
# athena_* — have never had a driver row and MUST be inside the window.)
# Late round-2 additions with no driver row yet (include in the r03
# window too): pq_encode pq_search pq_rerank heavy_hitters theta_distinct
# skew_report salted_join_agg weighted_sample gap_fill_interp ivf_pq
# kll_quantile — 64 candidates for 50 slots;
# drop enough r01-green sentinels (they are proven once already) to fit.
_DRIVER_WINDOW_PRIORITY = [
    # round-1 unchecked: llm dedup/ANN family
    "simhash",
    "cosine_topk",
    "minhash_lsh",
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
    # round-1 unchecked: temporal family
    "session_stats",
    "windowed_rollup",
    "asof_join",
    "sliding_rollup",
    "funnel",
    "cohort_retention",
    "json_props",
    "scd2_history",
    "top_paths",
    "date_spine_fill",
    "unpivot_metrics",
    "session_native",
    # round-1 unchecked: the 8 serving endpoints
    "api_earnings",
    "api_needle",
    "api_avg_profitability",
    "api_total_profit",
    "api_profit_avg",
    "api_models_distribution",
    "api_dow",
    "api_detailed_ranking",
    # sketches — no driver verdict in round 1 (err:"no_oracle"), now oracle-ized
    "approx_distinct",
    "quantile_sketch",
    # already-green sentinels (regression canaries)
    "earnings_by_day",
    "nested_flatten",
    "exact_dedup",
]
