"""Scalable global ranking — no single-reducer window anywhere.

``Window.orderBy(...)`` with no partition key funnels the whole frame
through ONE reducer (Spark logs ``WindowExec: No Partition Defined``).
Fine for dim-sized post-aggregation frames, fatal when the ranked set
grows 100×. These helpers keep the exact ROW_NUMBER semantics while
staying parallel:

- :func:`global_row_number` — two-phase distributed ranking: range-
  repartition on the sort keys (so partition i wholly precedes partition
  i+1), rank locally per partition, then add per-partition offsets. The
  only driver-side data is one count per partition (bounded by
  ``spark.sql.shuffle.partitions``, never by data volume) — the same
  shape as RDD ``zipWithIndex``.
- :func:`top_k` — deterministic global top-k via orderBy + limit, which
  Spark executes as TakeOrderedAndProject: per-partition heaps merged on
  the driver, k × n_partitions rows moved, no window at all.

Reference parity: ROW_NUMBER() OVER (ORDER BY ...) in
models_earning_distribution.py:100 and detailedRanking.py:88-138; the
two-phase rewrite returns bit-identical ranks for any total ordering
(callers must pass a tie-free order, e.g. append the business key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LRN = "__rank_local"
_OFF = "__rank_offset"


def global_row_number(
    df: DataFrame, order_by: Sequence[Column], out_col: str = "ranking"
) -> DataFrame:
    """Distributed ROW_NUMBER() OVER (ORDER BY ...) — two-phase.

    ``order_by`` must be a total (tie-free) ordering for the ranks to be
    deterministic — same contract as the single-reducer window it
    replaces. Phase 1: ``repartitionByRange`` on the sort keys puts every
    row of partition i before every row of partition i+1; a window
    partitioned BY partition id ranks locally (parallel). Phase 2: the
    per-partition row counts (one long per partition) come back to the
    driver and go out as a broadcast offset table; global rank =
    local rank + offset. The INPUT is materialized first:
    ``repartitionByRange`` runs a sampling pass over its child to pick
    range bounds, so an un-materialized input would be computed twice
    (sample + shuffle) before the count job even runs. The ranked frame
    is then materialized once more so the count job doesn't recompute
    the window.
    """
    d = (
        df.localCheckpoint(eager=False)
        .repartitionByRange(*order_by)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(
            _LRN,
            F.row_number().over(Window.partitionBy(_PID).orderBy(*order_by)),
        )
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r[_PID], r["_n"])
        for r in d.groupBy(_PID).agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    spark = df.sparkSession
    from data_lake_spark.functions.localframe import values_df

    off_df = values_df(spark, offsets, f"{_PID} int, {_OFF} long")
    return (
        d.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col(_LRN) + F.col(_OFF)).cast("long"))
        .drop(_PID, _LRN, _OFF)
    )


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Deterministic global top-k rows: orderBy + limit, which the
    planner executes as TakeOrderedAndProject (per-partition heaps, no
    global sort, no window). ``order_by`` must be tie-free for a
    deterministic result set."""
    return df.orderBy(*order_by).limit(k)


def ranked_top_k(
    df: DataFrame, order_by: Sequence[Column], k: int, out_col: str = "ranking"
) -> DataFrame:
    """Global top-k WITH ranks, in one pass: TakeOrderedAndProject bounds
    the frame at k rows, then a constant-partition window ranks them.
    The single window partition is correct BY CONSTRUCTION — its input
    is ≤ k rows regardless of data volume (the limit, not the data,
    bounds it) — so unlike an unpartitioned window over an unbounded
    frame this never becomes a reducer bottleneck. Use
    :func:`global_row_number` when ALL rows need ranks."""
    w = Window.partitionBy(F.lit(0)).orderBy(*order_by)
    return (
        top_k(df, order_by, k)
        .withColumn(out_col, F.row_number().over(w))
    )


def with_broadcast_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Attach a one-row aggregate (e.g. a grand total) to every row —
    the percentage-of-total companion to the ranking helpers. Plans as a
    BroadcastNestedLoopJoin over exactly ONE broadcast row — the
    canonical scalar-subquery shape (a literal-key equi-join constant-
    folds to the same plan), equivalent to a map-side append of the
    scalar. Callers appear in tests/test_plan_contracts.py's scalar-BNLJ
    whitelist; pair-space nested loops remain forbidden there."""
    return df.crossJoin(F.broadcast(scalar_df))
