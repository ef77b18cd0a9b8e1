"""Banded range join — equi-join-able |a − b| ≤ eps matching.

Spark plans a bare inequality predicate as BroadcastNestedLoopJoin /
cartesian — O(L×R) at 100 TB. The scale path quantizes both sides into
eps-wide buckets: a right row lives in bucket floor(v/eps); a left row can
only match rows in its own or adjacent buckets, so replicating the LEFT
side into 3 candidate buckets turns the range predicate into an equi-join
on the bucket id, followed by an exact refine filter. Cost: 3× left
replication + one hash shuffle — linear, no pair-space blowup. Each
qualifying (left, right) pair is emitted exactly once (the right row has
ONE bucket; the left replicas target distinct buckets).

The same trick generalizes to interval containment (bucket by interval
grid, dedupe) and is the 1-D case of the SRP/IVF cell blocking used in
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps: float,
    how_strict: bool = False,
) -> DataFrame:
    """All (left, right) pairs with |left_val − right_val| ≤ eps
    (< eps when ``how_strict``). Column sets must be disjoint. The bucket
    id floor(v/eps) is computed in double — fine while |v/eps| < 2^53."""
    lb = left.withColumn(
        "__cand", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).withColumn(
        "__bucket",
        (F.floor(F.col(left_val) / F.lit(eps)) + F.col("__cand")).cast("long"),
    ).drop("__cand")
    rb = right.withColumn(
        "__bucket", F.floor(F.col(right_val) / F.lit(eps)).cast("long")
    )
    joined = lb.join(rb, "__bucket").drop("__bucket")
    diff = F.abs(F.col(left_val) - F.col(right_val))
    return joined.filter(diff < F.lit(eps) if how_strict else diff <= F.lit(eps))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    chunk: int,
) -> DataFrame:
    """All (left, right) pairs whose CLOSED integer intervals overlap:
    ``left_start <= right_end AND right_start <= left_end``. Column
    sets must be disjoint; bounds must be integral (epoch seconds /
    nanos — double bounds lose exactness past 2^53).

    The chunked interval join Spark lacks natively: each interval is
    exploded onto the fixed-width time chunks it touches (bounded
    fan-out of len/chunk + 1 rows), the pair space becomes a plain
    hash equi-join on the chunk id, and each overlapping pair is
    emitted EXACTLY ONCE with zero dedup shuffle — only the chunk
    containing max(start_l, start_r) keeps the pair (that instant
    lies inside both intervals, so both sides exploded its chunk).
    Scale knobs: chunk width trades fan-out against per-chunk join
    fan-in; hot chunks (a global incident window everyone overlaps)
    salt exactly like any skewed equi-join key."""
    lc = left.withColumn(
        "__chk",
        F.explode(
            F.sequence(
                F.expr(f"{left_start} div {chunk}"),
                F.expr(f"{left_end} div {chunk}"),
            )
        ),
    )
    rc = right.withColumn(
        "__chk",
        F.explode(
            F.sequence(
                F.expr(f"{right_start} div {chunk}"),
                F.expr(f"{right_end} div {chunk}"),
            )
        ),
    )
    return (
        lc.join(rc, "__chk")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
        )
        .filter(
            F.col("__chk")
            == F.expr(f"greatest({left_start}, {right_start}) div {chunk}")
        )
        .drop("__chk")
    )
