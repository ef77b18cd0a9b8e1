"""Sequence packing: fill fixed-token-budget training sequences.

A pretraining pipeline does not feed documents one-by-one; it packs them
into context-window-sized sequences (e.g. 2048 tokens) so no compute is
wasted on padding. The distributed-deterministic formulation: order
documents by a stable key within each partition group, take the running
token total, and assign each document to the sequence its *start offset*
falls in — a pure window + integer division, no driver loop, no UDF.

This is contiguous-fill packing (documents may straddle a boundary and
be split at training time, exactly like GPT-style span packing). Bin
packing that forbids straddling is a different operator with inherent
sequential dependence; contiguous fill is what large pipelines actually
run because it stays embarrassingly parallel.

Scale shape: the window partitions by ``group_cols`` (e.g. language or
shard), so state per task is one running sum — no global sort, no single
reducer. With N groups ≥ cluster cores, this packs 100 TB in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_cols: list[str],
    order_cols: list[str],
    token_col: str = "n_tokens",
) -> DataFrame:
    """Assign each document a ``seq_id`` within its group such that the
    concatenated token stream fills ``budget``-token sequences in order.

    Adds ``start_off`` (token offset of the document's first token within
    its group's stream) and ``seq_id`` (= start_off // budget)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("__cum", F.sum(token_col).over(w))
        .withColumn("start_off", (F.col("__cum") - F.col(token_col)).cast("long"))
        .withColumn("seq_id", (F.col("start_off") / budget).cast("long"))
        .drop("__cum")
    )
