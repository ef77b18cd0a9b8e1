"""Generic table profiling — the data-quality scan every lake runs.

The reference has no profiling at all; its Glue crawlers infer schema
and nothing checks content (null bursts, key cardinality collapse —
the classic silent upstream failures). ``profile`` computes per-column
null counts and distinct cardinalities for ANY DataFrame in ONE
aggregation pass: all metrics ride the same scan and the same partial
aggregation, so profiling 100 TB costs one read, not one read per
column. Output is long-form (column → metrics) via a single explode —
ready to diff against yesterday's profile as a drift alarm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame) -> DataFrame:
    """One-pass profile: (col_name, n_rows, n_nulls, n_distinct) per
    column. n_distinct excludes nulls (COUNT DISTINCT semantics)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in df.columns
        ]
    )
    return row.select(F.explode(cols).alias("m")).select("m.*")


def drift_report(
    current: DataFrame,
    baseline: DataFrame,
    null_rate_tol: float = 0.02,
    distinct_ratio_tol: float = 0.5,
) -> DataFrame:
    """Diff two profiles (this run vs yesterday's stored one) into the
    drift alarm itself: per column, the null-rate delta and the
    distinct-cardinality ratio, each flagged against a tolerance.

    The failure modes this catches are the classic silent ones: an
    upstream starts sending nulls (null_rate jumps) or starts sending a
    constant (n_distinct collapses). Profiles are column-count-sized, so
    the diff is a broadcast join — the expensive part (one scan per
    table) already happened when the profiles were built.

    ``distinct_ratio_tol=0.5`` flags a column whose cardinality halved
    relative to row-count growth."""
    cur = current.select(
        "col_name",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate_cur"),
        (F.col("n_distinct") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
            "distinct_per_row_cur"
        ),
    )
    base = baseline.select(
        "col_name",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate_base"),
        (F.col("n_distinct") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
            "distinct_per_row_base"
        ),
    )
    # full outer can't build broadcast-side; both profiles are
    # column-count-sized, so the tiny shuffle is irrelevant
    j = cur.join(base, "col_name", "full_outer")
    null_delta = F.abs(
        F.coalesce("null_rate_cur", F.lit(0.0))
        - F.coalesce("null_rate_base", F.lit(0.0))
    )
    ratio = F.when(
        F.col("distinct_per_row_base") > 0,
        F.col("distinct_per_row_cur") / F.col("distinct_per_row_base"),
    )
    return j.select(
        "col_name",
        null_delta.alias("null_rate_delta"),
        ratio.alias("distinct_ratio"),
        (
            F.col("null_rate_cur").isNull()  # column disappeared
            | F.col("null_rate_base").isNull()  # column appeared
            | (null_delta > null_rate_tol)
            | (ratio < distinct_ratio_tol)
        ).alias("drifted"),
    ).orderBy("col_name")
