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
# Round 5 (this list): (a) doc_embed re-check (the r04 red) + the 8 queries
# ADDED during round 4 that have never had a driver row (lsh_recall,
# bm25_topk, rrf_fusion, pagerank_docs, central_keeper, dataset_card,
# ngram_novelty, bpe_merges), then (b) queries ADDED during round 5 — keep
# this block current as they land, they get their first row THIS round, then
# (c) the 22 r02-only queries not re-checked in r04, then (d) the r03-only
# block (first-checked in r03), oldest verdict first, to fill 50.
#
# ROUND 6 TODO (lists computed from CORRECTNESS_r03∩r04 — exact, no
# placeholders): rotate onto (a) any round-6 additions as they land, (b)
# the 24 rows round 5 displaced below rank 50 — api_detailed_ranking,
# approx_distinct, quantile_sketch, nested_flatten and exact_dedup
# (r02-green last, the oldest verdicts in the registry by r06: FIRST)
# plus the full 19-row r03-green (d) block below (the 24 round-5
# additions push all of (d) and the last five (c) rows out of the
# 50-row window),
# then (c) the remaining queries whose last green row is r03 (two
# rounds stale by r06): api_models_distribution avg_of_sums
# bigram_lm_score decontam dedup_keep_latest dow_distribution
# earnings_by_day earnings_series_pivot full_outer_platforms
# grouping_sets_report left_join_dim literal_dim_report minhash_lsh
# mixture_weights multi_agg_attrs ntile_deciles or_key_join pagination
# percentile_report profile_orders rank_models ratio_profitability
# repetition_stats revenue_by_region rollup_report shingle_pairs
# text_stats top5_distribution topk_per_group trailing_7d weekly_agg.
# (b)+(c) = 40; additions + oldest r04-green sentinels fill to 50.
_DRIVER_WINDOW_PRIORITY = [
    # (a) r04 red re-check + round-4 additions, never driver-checked (9)
    "doc_embed",
    "lsh_recall",
    "bm25_topk",
    "rrf_fusion",
    "pagerank_docs",
    "central_keeper",
    "dataset_card",
    "ngram_novelty",
    "bpe_merges",
    # (b) round-5 additions — first driver row this round (keep current)
    "fuzzy_match",
    "fuzzy_match_capped",
    "er_recall",
    "pareto_front",
    "trend_slopes",
    "sq_search",
    "winsorize",
    "interval_overlap",
    "lang_fit",
    "sliding_distinct",
    "anomaly_days",
    "bpe_encode",
    "negative_pairs",
    "curriculum_order",
    "dq_checks",
    "epoch_plan",
    "triangle_count",
    "classifier_eval",
    "quality_tradeoff",
    "source_lift",
    "label_affinity",
    "mirror_matrix",
    "rolling_corr",
    "k_anonymity",
    # (c) r02-only block not re-checked in r04 (22; with 24 round-5
    # additions above, rank 50 cuts this block after api_dow —
    # api_detailed_ranking, approx_distinct, quantile_sketch,
    # nested_flatten and exact_dedup (r02-green last) are displaced and
    # LEAD the ROUND 6 list as its five oldest rows)
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
    "api_earnings",
    "api_needle",
    "api_avg_profitability",
    "api_total_profit",
    "api_profit_avg",
    "api_dow",
    "api_detailed_ranking",
    "approx_distinct",
    "quantile_sketch",
    "nested_flatten",
    "exact_dedup",
    # (d) r03-only block, oldest verdict first (19) — round-5 additions
    # displace this tail into the ROUND 6 TODO. With the 24 round-5
    # additions above, rank 50 falls inside block (c): ALL 19 (d) rows
    # plus (c)'s api_detailed_ranking, approx_distinct, quantile_sketch,
    # nested_flatten and exact_dedup sit below rank 50. ROUND 6 TODO
    # block (b) is therefore: api_detailed_ranking + approx_distinct +
    # quantile_sketch + nested_flatten + exact_dedup (r02-stale, oldest
    # — first), then pq_encode pq_search pq_rerank ivf_pq heavy_hitters
    # theta_distinct kll_quantile skew_report line_dedup source_cap
    # partial_overlap curation_funnel athena_earnings_day
    # athena_dow_dist athena_weekly athena_needle_period
    # gap_fill_interp weighted_sample salted_join_agg (all r03-stale)
    "pq_encode",
    "pq_search",
    "pq_rerank",
    "ivf_pq",
    "heavy_hitters",
    "theta_distinct",
    "kll_quantile",
    "skew_report",
    "line_dedup",
    "source_cap",
    "partial_overlap",
    "curation_funnel",
    "athena_earnings_day",
    "athena_dow_dist",
    "athena_weekly",
    "athena_needle_period",
    "gap_fill_interp",
    "weighted_sample",
    "salted_join_agg",
]
