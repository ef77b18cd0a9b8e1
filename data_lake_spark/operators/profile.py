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
