"""Training-shard export: the handoff artifact from the curation engine
to a training job.

A pretraining run does not read a lake table; it reads a frozen set of
SHARD files plus a manifest that says exactly what each shard contains
(doc count, token count, content digest) so the training side can
verify, resume, and mix without re-scanning data. The reference has no
training export (its gold zone feeds dashboards —
`/root/reference/src/lambdas/earnings_analytics/lambda_function.py`
serves JSON); this is part of the LLM-pipeline extension surface
(SURVEY §8).

Design, 100 TB-shaped end to end:

- shard assignment is :func:`operators.packing.pack_sequences` with
  ``budget=tokens_per_shard`` — a per-group running-sum window over a
  caller-supplied TOTAL order, so the same input always yields the same
  shards (no monotonically_increasing_id, no round-robin: assignment is
  retry-deterministic, the same property layout.compact_partitions
  guarantees);
- data lands as parquet partitioned by (*group_cols, shard_id) — one
  directory per shard, prunable by shard id, written by one job;
- the per-shard manifest is ONE map-side-combinable aggregate over the
  assigned frame (n_docs, n_tokens, order-insensitive content digest
  via functions.checksum.row_hash — the same digest recipe used for
  migration reconciliation), written DISTRIBUTED as JSON lines: at
  100 TB the manifest itself is millions of rows and must not collect;
- a driver-side ``_SUMMARY.json`` (shard count, doc/token totals, a
  grand digest folded from the per-shard digests) is written LAST as
  the commit point — readers that find the summary know data and
  manifest are complete (the versioned.py manifest-last pattern).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_spark.functions.checksum import row_hash
from data_lake_spark.operators.packing import pack_sequences


def export_training_shards(
    docs: DataFrame,
    dst: str,
    tokens_per_shard: int,
    token_col: str = "n_tokens",
    order_cols: list[str] = ("doc_id",),
    group_cols: list[str] = (),
) -> dict:
    """Write ``docs`` as token-budgeted training shards + manifest.

    Shards use contiguous fill (a document belongs to the shard its
    START token offset falls in, so one document may overflow the
    budget — the GPT-style packing semantics; per-shard token sums are
    bounded by ``tokens_per_shard + max_doc_tokens - 1``).
    ``order_cols`` must be a total order within each group (e.g. the
    doc id) — that is what makes the export deterministic on any
    partitioning and under task retries.

    Layout: ``dst/data/<group=..>/shard_id=N/*.parquet``,
    ``dst/manifest/*.json`` (one line per shard), ``dst/_SUMMARY.json``
    written last. Returns the summary dict."""
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    content_cols = list(docs.columns)

    # retract the commit point FIRST: a re-export into an existing dst
    # must never leave the previous _SUMMARY.json standing over a
    # half-overwritten data/ — a reader that finds the summary is
    # promised complete data+manifest (the versioned.py rule: publish
    # is the LAST step, so un-publish is the first)
    summary_path = os.path.join(dst, "_SUMMARY.json")
    if os.path.exists(summary_path):
        os.remove(summary_path)

    # empty group_cols = ONE global shard stream: a single-reducer
    # window, fine for bounded exports; pass group_cols (lang, source)
    # to parallelize the running sum at corpus scale.
    # localCheckpoint: the data write, the manifest write, and the
    # summary aggregate would otherwise each re-run the packing window
    # AND its whole upstream (in pretrain_prepare: the dedup join).
    assigned = pack_sequences(
        docs,
        budget=tokens_per_shard,
        group_cols=group_cols,
        order_cols=order_cols,
        token_col=token_col,
    ).withColumnRenamed("seq_id", "shard_id").localCheckpoint(eager=False)

    part_cols = group_cols + ["shard_id"]
    # pin static overwrite ON THE WRITE: under a session-level
    # partitionOverwriteMode=dynamic, a re-export that produces fewer
    # shards would leave the old extra shard_id dirs standing under
    # dst/data while _SUMMARY.json re-publishes "complete" — the commit
    # point must not depend on ambient session config
    assigned.select(*content_cols, "shard_id").write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "static").partitionBy(
        *part_cols
    ).parquet(os.path.join(dst, "data"))

    manifest = (
        assigned.withColumn("__h", row_hash(assigned, content_cols))
        .groupBy(*part_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("long").alias("n_tokens"),
            # sum in decimal(38) then wrap to 64 bits — ANSI-overflow-safe
            # at any shard size (the table_checksum recipe)
            F.pmod(
                F.sum(F.col("__h").cast("decimal(38,0)")).cast("decimal(38,0)"),
                F.lit(str(1 << 64)).cast("decimal(38,0)"),
            )
            .cast("decimal(20,0)")
            .alias("hash_sum"),
            F.bit_xor("__h").alias("hash_xor"),
        )
    )
    manifest = manifest.localCheckpoint(eager=False)  # written AND folded
    manifest.write.mode("overwrite").json(os.path.join(dst, "manifest"))

    # grand totals + a digest folded over the per-shard digests: one
    # one-row aggregate crosses to the driver, never shard rows
    tot = manifest.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.col("hash_sum").cast("decimal(38,0)")).alias("s"),
        F.bit_xor("hash_xor").alias("x"),
    ).collect()[0]
    summary = {
        "tokens_per_shard": tokens_per_shard,
        "group_cols": group_cols,
        "order_cols": order_cols,
        "n_shards": int(tot.n_shards),
        # SUM over zero manifest rows is NULL — an empty export reports
        # proper zeros, consistent with n_shards
        "n_docs": int(tot.n_docs or 0),
        "n_tokens": int(tot.n_tokens or 0),
        "grand_hash_sum": int(tot.s or 0) % (1 << 64),
        "grand_hash_xor": int(tot.x or 0) & ((1 << 64) - 1),
    }
    # commit point: published LAST, atomically, only after data +
    # manifest both succeeded (tmp + rename, the versioned.py pointer)
    tmp = summary_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(summary, fh)
    os.replace(tmp, summary_path)
    return summary
