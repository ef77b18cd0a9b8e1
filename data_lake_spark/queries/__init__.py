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
        llm8,
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
        train_q,
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
    reg.update(llm8.REGISTRY)
    reg.update(quality_q.REGISTRY)
    reg.update(temporal.REGISTRY)
    reg.update(temporal2.REGISTRY)
    reg.update(temporal3.REGISTRY)
    reg.update(temporal4.REGISTRY)
    reg.update(train_q.REGISTRY)
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
# checked the first 50 in module order; round 2 front-loaded the 45 previously
# unchecked queries + 2 freshly-oracle-ized sketches + 3 sentinels — all 50
# green. Round 3 (this list) front-loads the 19 queries that have NEVER had a
# driver row (late round-2 additions: pq family, sketches2, llm6 dedup suite,
# athena dialect, gap-fill, sampling, skew), then re-checks 28 of the 45
# r01-green-only queries as regression canaries, plus 3 r02-green sentinels —
# exactly 50. After r03, r01∪r02∪r03 covers all 114 queries that existed at
# rotation time; the 8 queries ADDED during round 3 (ivf_stored,
# ivf_pq_stored, semantic_dedup, semantic_dedup_capped, ann_recall,
# classifier_train, doc_embed, doc_topk — registry is now 122) have local
# oracle parity only and still need their first driver row.
#
# ROUND 4 TODO: rotate the window onto (a) those 8 round-3 additions —
# they MUST be in the r04 window, (b) the 17 r01-only queries not
# re-checked here (proj_filter_compute or_filter_dim point_lookup global_sum
# date_parts json_payload string_funcs array_funcs set_ops_halves cube_report
# semi_join_active anti_join_inactive running_total hash_sample train_split
# mom_change lang_id), and (c) the r02-only block, oldest verdict first.
_DRIVER_WINDOW_PRIORITY = [
    # never driver-checked (19) — MUST be in this window
    "pq_encode",
    "pq_search",
    "pq_rerank",
    "ivf_pq",
    "heavy_hitters",
    "theta_distinct",
    "kll_quantile",
    "skew_report",
    "salted_join_agg",
    "weighted_sample",
    "gap_fill_interp",
    "line_dedup",
    "source_cap",
    "partial_overlap",
    "curation_funnel",
    "athena_earnings_day",
    "athena_dow_dist",
    "athena_weekly",
    "athena_needle_period",
    # r01-green regression canaries (28 of 45; the rest keep their r01 row)
    "left_join_dim",
    "or_key_join",
    "full_outer_platforms",
    "literal_dim_report",
    "weekly_agg",
    "multi_agg_attrs",
    "avg_of_sums",
    "dow_distribution",
    "ratio_profitability",
    "rank_models",
    "top5_distribution",
    "pagination",
    "earnings_series_pivot",
    "dedup_keep_latest",
    "rollup_report",
    "topk_per_group",
    "revenue_by_region",
    "grouping_sets_report",
    "trailing_7d",
    "profile_orders",
    "ntile_deciles",
    "percentile_report",
    "bigram_lm_score",
    "repetition_stats",
    "decontam",
    "mixture_weights",
    "text_stats",
    "shingle_pairs",
    # r02-green sentinels (regression canaries)
    "earnings_by_day",
    "minhash_lsh",
    "api_models_distribution",
]
