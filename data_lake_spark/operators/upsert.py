"""Keyed upsert with decrease-traceability (SURVEY §2.8 D3/D4) and the
dedup family (D1/D2).

The reference upserts one record per HTTP POST: probe Athena for
``(_id, date)``, overwrite the S3 JSON object if present, and append a
traceability record when ``total_earnings`` decreases
(``/root/reference/src/lambdas/ingest/ingestStreamateModelPerformance.py:72-142``,
identical jasmin twin). That design is O(1 query + 1 S3 write) *per
record* — at scale the same semantics are a set-oriented MERGE:

- incoming batch is deduped keep-latest per key (idempotent re-delivery);
- matched rows are overwritten, unmatched inserted (anti-join + union —
  the plain-Parquet emulation of Delta's ``MERGE INTO``; swap in Delta on
  a cluster that has it);
- the decrease-audit becomes a pre-join producing a trace side-output.

Note: the reference compares earnings as *strings* (Athena VarCharValue);
here the comparison is numeric — a deliberate fix, flagged for parity
review.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class UpsertResult:
    merged: DataFrame  # the new table state
    trace: DataFrame  # decrease-audit side-output (may be empty)
    n_updated_expr: DataFrame  # per-action counts for observability


def keep_latest(
    df: DataFrame, keys: list[str], order_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """D1/D4 scale-safe dedup: one deterministic winner per key
    (bronze_ingest_streamate_mock.py:42-48 uses dropDuplicates — order-
    dependent on a cluster; a window with explicit recency + tiebreak is
    reproducible on any partitioning)."""
    order = [F.col(order_col).desc_nulls_last()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_batch(df: DataFrame, id_col: str, batch_col: str = "batch_id") -> DataFrame:
    """Keep only each id's row from its highest ``batch_col`` — the
    reader-side dedup for per-batch-directory streaming indexes
    (streaming.start_ivfpq_index_ingest / start_ivf_index_ingest): a
    vector re-ingested in a later micro-batch leaves rows under BOTH
    batch directories, and any scorer that sums over code/candidate rows
    would double-count it. One map-side-combinable hash aggregate
    (max_by over a struct of the remaining columns) — cheap relative to
    the scan it protects. No-op when ``batch_col`` is absent (batch-built
    indexes have no batch dimension)."""
    if batch_col not in df.columns:
        return df
    others = [c for c in df.columns if c not in (id_col, batch_col)]
    return (
        df.groupBy(id_col)
        .agg(F.max_by(F.struct(*others), F.col(batch_col)).alias("__st"))
        .select(F.col(id_col), *[F.col(f"__st.{c}").alias(c) for c in others])
    )


def dedup_content(df: DataFrame, ignore_cols: list[str]) -> DataFrame:
    """D2: drop duplicates on all columns EXCEPT audit columns
    (bronze_ingest_users_mock.py:79-80 excludes year/month/day/hour/minute)."""
    content_cols = [c for c in df.columns if c not in set(ignore_cols)]
    return df.dropDuplicates(content_cols)


def upsert_performance(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str] = ("_id", "date"),
    value_col: str = "total_earnings",
    order_col: str = "updated_at",
) -> UpsertResult:
    """D3: batch MERGE of performance records with decrease-traceability.

    Scale shape: both sides hash-shuffle on the (high-cardinality, uniform)
    key — one shuffle each, no skew; the trace join reuses the same
    partitioning. With Delta available this becomes
    ``MERGE INTO ... WHEN MATCHED [AND s.v < t.v → also insert trace]``.
    """
    keys = list(keys)
    inc = keep_latest(incoming, keys, order_col)

    ex = existing.alias("t")
    new = inc.alias("s")
    joined = new.join(ex, keys, "left")

    # decrease-audit (trace_data fields per ingestStreamateModelPerformance.py:98-108)
    trace = joined.filter(
        F.col(f"t.{value_col}").isNotNull()
        & (
            F.col(f"s.{value_col}").cast("double")
            < F.col(f"t.{value_col}").cast("double")
        )
    ).select(
        *[F.col(k) for k in keys],
        F.col(f"t.{value_col}").alias(f"prev_{value_col}"),
        F.col(f"s.{value_col}").alias(f"new_{value_col}"),
        F.col("t.online_seconds").alias("prev_online_seconds"),
        F.col("s.online_seconds").alias("new_online_seconds"),
        F.col(f"s.{order_col}").alias("processed_at"),
    )

    untouched = ex.join(new, keys, "left_anti")
    merged = untouched.select(existing.columns).unionByName(
        inc.select(existing.columns)
    )

    counts = joined.agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(
            F.when(F.col(f"t.{value_col}").isNotNull(), 1).otherwise(0)
        ).alias("n_updated"),
        F.sum(F.when(F.col(f"t.{value_col}").isNull(), 1).otherwise(0)).alias(
            "n_inserted"
        ),
    )
    return UpsertResult(merged=merged, trace=trace, n_updated_expr=counts)


def delta_available(spark) -> bool:
    """True when delta-spark is importable AND the session was built with
    the Delta SQL extension + catalog (both are required for MERGE)."""
    try:
        import delta  # noqa: F401
    except Exception:
        return False
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in ext


def upsert_performance_delta(
    spark,
    table_path: str,
    incoming: DataFrame,
    keys: list[str] = ("_id", "date"),
    value_col: str = "total_earnings",
    order_col: str = "updated_at",
) -> DataFrame:
    """The same MERGE semantics as :func:`upsert_performance`, executed as
    a real Delta ``MERGE INTO`` against a Delta table at ``table_path`` —
    the production path on clusters that ship delta-spark (the anti-join +
    union emulation above is the plain-Parquet fallback).

    Returns the decrease-audit trace DataFrame (computed with the same
    pre-join as the emulation, BEFORE the merge mutates the table).
    Raises RuntimeError when Delta is unavailable — callers feature-detect
    via :func:`delta_available`; tests skip with a documented reason.
    """
    if not delta_available(spark):
        raise RuntimeError(
            "delta-spark is not available in this session; use "
            "upsert_performance (anti-join + union emulation) instead"
        )
    from delta.tables import DeltaTable  # type: ignore

    keys = list(keys)
    inc = keep_latest(incoming, keys, order_col)
    target = DeltaTable.forPath(spark, table_path)

    trace = (
        inc.alias("s")
        .join(target.toDF().alias("t"), keys, "left")
        .filter(
            F.col(f"t.{value_col}").isNotNull()
            & (
                F.col(f"s.{value_col}").cast("double")
                < F.col(f"t.{value_col}").cast("double")
            )
        )
        .select(
            *[F.col(k) for k in keys],
            F.col(f"t.{value_col}").alias(f"prev_{value_col}"),
            F.col(f"s.{value_col}").alias(f"new_{value_col}"),
            F.col(f"s.{order_col}").alias("processed_at"),
        )
        .localCheckpoint()  # materialize before MERGE mutates the target
    )
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        target.alias("t")
        .merge(inc.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return trace


def high_watermark_filter(
    df: DataFrame, watermark_col: str, last_processed
) -> DataFrame:
    """S11: incremental-scan equivalent of Glue job bookmarks
    (data-lake-stack.yml:36): process only rows past the stored watermark.
    The predicate pushes down to the Parquet scan, so old partitions are
    never read."""
    if last_processed is None:
        return df
    return df.filter(F.col(watermark_col) > F.lit(last_processed))
