"""As-of (point-in-time) join — an operator the reference's Athena SQL and
built-in Spark both lack, composed from Spark primitives per the
union + ordered-window pattern.

For every left row, attach the most recent right row with the same key and
``right.ts <= left.ts`` (backward as-of; ties at equal ts match). The
distributed shape: tag both sides, union, ONE shuffle on the key, sort by
(ts, side) within each key partition, and carry the right-side values
forward with ``last(ignorenulls)`` over an unbounded-preceding row frame.
Cost is a single exchange + per-partition sort — the same as one
sort-merge join — and never materializes the O(L×R) inequality pair space
a naive range predicate would.

At 100 TB: skew follows the key distribution (salt hot keys upstream if
one user dominates); state per partition is one row of carried values per
right column — constant memory beyond the sort.

Determinism: the right side must be unique per (key, ts) — pre-dedupe
with ``operators.upsert.keep_latest`` — and the sort places right rows
before left rows at equal ts so an equal-timestamp right row is visible
to the left row, matching DuckDB/pandas ``merge_asof`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join. ``left`` keeps all its columns; matched right
    values arrive as ``{prefix}{col}`` (plus ``{prefix}ts``), null when no
    right row precedes. ``right`` must be unique per (on, ts_col)."""
    sides_common = [*on, ts_col]
    l_tagged = left.withColumn("__side", F.lit(1))
    for c in [f"{prefix}ts", *[f"{prefix}{c}" for c in value_cols]]:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = right.select(
        *sides_common,
        F.col(ts_col).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    # align: right rows carry nulls for left-only columns
    left_only = [c for c in left.columns if c not in sides_common]
    for c in left_only:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left.columns,
        "__side",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in ["ts", *value_cols]
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
