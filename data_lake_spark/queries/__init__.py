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
# Round 6 (this list; blocks computed from the actual CORRECTNESS_r01–r05
# latest-green rounds, recomputed this session — r02-stale: 5, r03-stale:
# 50, r04-stale: 49, r05-green: 50):
# (a) round-6 additions — first driver row THIS round (keep current as
#     they land);
# (b) the five r02-stale rows (oldest verdicts in the registry — last
#     green row three rounds back): api_detailed_ranking approx_distinct
#     quantile_sketch nested_flatten exact_dedup;
# (c) the 19-row r03-green (d)-block from the round-5 rotation
#     (first-checked in r03, displaced below rank 50 by the 24 round-5
#     additions): pq_encode … salted_join_agg;
# (d) the remaining 31 r03-stale rows, alphabetical (deterministic
#     rank-50 cut): each round-6 addition in (a) displaces one row off
#     this tail into the ROUND 7 TODO.
#
# ROUND 7 TODO (computed from this round's FINAL window: 11 additions
# + 5 r02-stale + 19 (c) = 35, rank 50 cuts block (d) after its 15th
# alphabetical row, `multi_agg_attrs` — verified against the live
# full_registry() ordering): lead with the 16 displaced (d)-tail rows,
# still r03-green and the oldest verdicts in the registry by r07 —
# ntile_deciles or_key_join pagination percentile_report
# profile_orders rank_models ratio_profitability repetition_stats
# revenue_by_region rollup_report shingle_pairs text_stats
# top5_distribution topk_per_group trailing_7d weekly_agg — then the
# 49 r04-stale rows oldest-first (recompute the exact list from
# CORRECTNESS_r06 at round start, the standing discipline); round-7
# additions slot in at the top as they land, each displacing one
# r04-stale row into the ROUND 8 TODO.
_DRIVER_WINDOW_PRIORITY = [
    # (a) round-6 additions — first driver row this round (keep current)
    "exact_substr",
    "exact_substr_clean",
    "dist_drift",
    "decontam_substr",
    "lang_confusion",
    "embedding_coverage",
    "dup_histogram",
    "bpe_fertility",
    "exact_substr_pairs",
    "temp_weights",
    "ivf_balance",
    # (b) r02-stale — the five oldest verdicts in the registry (3)
    "api_detailed_ranking",
    "approx_distinct",
    "quantile_sketch",
    "nested_flatten",
    "exact_dedup",
    # (c) the 19-row r03-green block first-checked in r03 (the round-5
    # rotation's (d) block, displaced below rank 50 there)
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
    # (d) remaining r03-stale rows, alphabetical — rank 50 cuts inside
    # this block; the displaced tail leads the ROUND 7 TODO above
    "api_models_distribution",
    "avg_of_sums",
    "bigram_lm_score",
    "decontam",
    "dedup_keep_latest",
    "dow_distribution",
    "earnings_by_day",
    "earnings_series_pivot",
    "full_outer_platforms",
    "grouping_sets_report",
    "left_join_dim",
    "literal_dim_report",
    "minhash_lsh",
    "mixture_weights",
    "multi_agg_attrs",
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
]
