"""The reference's three job lifecycles (SURVEY §3) composed end-to-end.

Each Glue/Lambda entry point becomes one idempotent function over a
``Lake``; chained they are the whole medallion flow the reference runs as
scheduled AWS jobs:

1. ``bronze_ingest`` — API payload → dedup-union with existing bronze →
   partitioned overwrite (§3.2, bronze_ingest_streamate_mock.py:28-55).
2. ``silver_conform`` — bronze feed + users → explode-flattened silver
   tables (§3.3, silver_ingest_streamate_mock.py:25-111 — minus its
   collect()-loop anti-pattern).
3. ``gold_publish`` — a named query's result persisted to the gold zone
   (§3.1 step 6; Athena's OutputLocation becomes a parquet table).

Scale posture: every step is a declarative plan over the lake paths —
re-running any step is safe (dedup keys make bronze idempotent, silver
and gold are pure functions of their inputs), which is what turns a
failed 100 TB backfill from an incident into a retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_lake_spark.io import Lake, read_json_payload
from data_lake_spark.operators.nested import (
    STREAMATE_FEED_SCHEMA,
    conform_earnings_by_performer,
    flatten_performer_earnings,
    flatten_studio_earnings,
)
from data_lake_spark.operators.upsert import keep_latest


def bronze_ingest(
    lake: Lake,
    payload: dict | list | str,
    table: str = "streamate",
    processing_date: str = "1970-01-01",
) -> DataFrame:
    """§3.2: payload → bronze with union-dedup against the existing zone
    (first run = payload only). Dedup key (studioId, earnings date span)
    is content-derived, so replaying the same feed is a no-op."""
    from pyspark.sql import functions as F

    new = read_json_payload(lake.spark, payload, STREAMATE_FEED_SCHEMA).withColumn(
        "processing_date", F.lit(processing_date)
    )
    if lake.exists("bronze", table):
        old = lake.read("bronze", table)
        merged = keep_latest(
            old.unionByName(new),
            keys=["data_timestamp"],
            order_col="processing_date",
        )
    else:
        merged = new
    merged.cache().count()  # materialize BEFORE overwriting the input path
    lake.write(merged, "bronze", table, partition_by=["processing_date"])
    merged.unpersist()
    return lake.read("bronze", table)


def silver_conform(
    lake: Lake,
    users: DataFrame,
    table: str = "streamate",
    gate: bool = True,
) -> None:
    """§3.3: bronze feed → exploded silver tables + user-conformed
    earnings (explode chain, not the reference's driver-side loops).

    ``gate=True`` runs the zone-boundary quality gate (quality.py) on the
    performer earnings before anything is written: the reference instead
    discovers bad rows as NaN guards in the serving layer
    (averageProfitability.py:251) — after they've shipped. One aggregate
    pass; a failure aborts the whole silver publish atomically."""
    feed = lake.read("bronze", table)
    perf = flatten_performer_earnings(feed)
    if gate:
        from data_lake_spark.quality import enforce, in_range, not_null

        enforce(
            perf,
            [
                not_null("performerId"),
                not_null("date"),
                in_range("payableAmount", 0.0, 1e9),
            ],
        )
    lake.write(flatten_studio_earnings(feed), "silver", "studios_earnings")
    lake.write(perf, "silver", "earnings_by_performer_raw")
    lake.write(
        conform_earnings_by_performer(feed, users),
        "silver",
        "earnings_by_performer",
    )


def gold_publish(
    lake: Lake, name: str, df: DataFrame
) -> DataFrame:
    """§3.1 step 6: persist a query result as a gold table (the Athena
    OutputLocation analogue) and return the re-read frame."""
    lake.write(df, "gold", name)
    return lake.read("gold", name)


def run_medallion(
    spark: SparkSession,
    root: str,
    payload: dict | list | str,
    users: DataFrame,
    processing_date: str = "1970-01-01",
) -> dict[str, DataFrame]:
    """The whole flow in one call — returns the registered frames."""
    from pyspark.sql import functions as F

    lake = Lake(spark, root)
    bronze_ingest(lake, payload, processing_date=processing_date)
    silver_conform(lake, users)
    earnings = lake.read("silver", "earnings_by_performer")
    daily = (
        earnings.groupBy("date")
        .agg(F.sum("payableAmount").alias("total_earnings"))
        .orderBy("date")
    )
    gold = gold_publish(lake, "earnings_by_day", daily)
    return {
        "bronze": lake.read("bronze", "streamate"),
        "silver": earnings,
        "gold": gold,
    }


def incremental_event_rollup(
    spark: SparkSession, gold_root: str, sf_dir: str
) -> int:
    """Incrementally-maintained gold rollup (the lakehouse materialized
    view): per-day event totals kept current by processing ONLY events
    past the stored watermark, additively merged into the previous
    rollup, with the rollup and its watermark committed in ONE group
    snapshot (versioned.commit_tables).

    Exactly-once without a log: the watermark lives in the same atomic
    snapshot as the rollup, so a crash anywhere before the manifest swap
    reprocesses the identical delta from the identical watermark and
    produces the identical snapshot — re-running is always safe. The
    delta scan is pushdown-pruned (catalog.load_table since_ns), so each
    refresh reads new data only: at 100 TB the refresh cost tracks the
    day's arrivals, not the table.

    Totals ride exact integer micros (functions/exact.py), so
    incremental and from-scratch results are bit-identical — proven in
    tests/test_incremental_rollup.py. Assumes monotone event time at
    the source (the batch bookmark contract, SURVEY §2.1 S11); late
    data belongs to the watermarked streaming path."""
    from pyspark.sql import functions as F

    from data_lake_spark.catalog import load_table
    from data_lake_spark.functions.exact import sum_micros
    from data_lake_spark.versioned import (
        commit_tables,
        current_snapshot_id,
        read_snapshot,
        read_table,
    )

    snap = read_snapshot(gold_root)
    last_ns = None
    if "watermark" in snap["tables"]:
        last_ns = read_table(spark, gold_root, "watermark").collect()[0].ts_ns

    ev = load_table(spark, sf_dir, "events", since_ns=last_ns)
    delta = ev.groupBy(
        F.expr("(ts div 1000000000) div 86400").alias("day")
    ).agg(
        sum_micros(F.col("value")).alias("value_u"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("max_ts"),
    )
    rows = delta.agg(
        F.count(F.lit(1)).alias("n"), F.max("max_ts").alias("wm")
    ).collect()[0]
    if rows["n"] == 0:
        return current_snapshot_id(gold_root)  # nothing new: no-op

    new = delta.select("day", "value_u", "n_events")
    if "rollup" in snap["tables"]:
        prev = read_table(spark, gold_root, "rollup")
        new = (
            prev.unionByName(new)
            .groupBy("day")
            .agg(
                F.sum("value_u").alias("value_u"),  # long + long: exact
                F.sum("n_events").alias("n_events"),
            )
        )
    wm_df = spark.createDataFrame([(int(rows["wm"]),)], "ts_ns long")
    return commit_tables({"rollup": new, "watermark": wm_df}, gold_root)


def pretrain_prepare(
    spark: SparkSession,
    sf_dir: str,
    dst: str,
    tokens_per_shard: int = 2048,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_jaccard: float = 0.5,
    bench: "DataFrame | None" = None,
    decontam_k: int = 5,
    decontam_min_tokens: int = 13,
) -> dict:
    """The whole corpus→training-shards preparation as ONE call —
    the integration surface a pretraining user actually runs, composing
    the individually-tested stages end-to-end:

    documents → quality gate (token-length bounds, the curation_funnel
    stage-1 rule) → near-dup removal (operators/textdedup.dedup_corpus:
    LSH candidates → exact-Jaccard verify → connected components →
    min-id keeper) → token-budgeted shard export with distributed
    manifest + _SUMMARY commit point (export.export_training_shards,
    grouped by language).

    With ``bench`` given, a benchmark-decontamination stage runs
    between dedup and export (drop survivors sharing a verbatim
    >= ``decontam_min_tokens`` token run with the eval set — broadcast
    gram semi-join, see the inline note).

    Returns the retention funnel every production pipeline publishes
    ({n_raw, n_gated, n_kept, n_clean, n_candidate_pairs,
    n_verified_edges, export: {...}}) — counts monotone by
    construction (n_raw >= n_gated >= n_kept >= n_clean), export totals
    equal to the post-decontam survivors
    (tests/test_pretrain_prepare.py).

    Scale posture is inherited, not re-argued: every stage is an
    equi-join or map-side-combinable aggregate (see each operator's
    docstring); the one additional materialization here is the gated
    frame, read by both the dedup and the export."""
    from pyspark.sql import functions as F

    from data_lake_spark.catalog import load_table
    from data_lake_spark.export import export_training_shards
    from data_lake_spark.operators.textdedup import dedup_corpus

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    n_raw = docs.count()
    gated = docs.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    ).localCheckpoint(eager=False)  # dedup and export both read it

    kept, dd = dedup_corpus(gated, min_jaccard=min_jaccard)
    n_clean = dd["n_kept"]
    if bench is not None:
        # benchmark decontamination (GPT-3 Brown et al. 2020 §C,
        # whole-doc form): drop any survivor sharing a >=
        # decontam_min_tokens verbatim run with the eval set. The
        # bench side is a broadcast gram-hash set (tiny by definition);
        # the train side pays one positioned-gram build + broadcast
        # semi-join — no corpus shuffle (operators/textdedup.
        # decontam_spans). Span-level excision stays available as the
        # surgical alternative; the pipeline takes the standard
        # conservative drop.
        from data_lake_spark.operators.textdedup import decontam_spans

        contaminated = (
            decontam_spans(
                kept, bench, k=decontam_k, min_tokens=decontam_min_tokens
            )
            .select("doc_id")
            .distinct()
        )
        kept = kept.join(contaminated, "doc_id", "left_anti")
    export = export_training_shards(
        kept,
        dst,
        tokens_per_shard=tokens_per_shard,
        order_cols=["doc_id"],
        group_cols=["lang"],
    )
    if bench is not None:
        # the export already counted the post-decontam survivors — a
        # separate kept.count() would re-execute the whole LSH-dedup +
        # decontam lineage a second time just to report a number the
        # shard manifest carries anyway
        n_clean = export["n_docs"]
    return {
        "n_raw": n_raw,
        "n_gated": dd["n_docs"],
        "n_candidate_pairs": dd["n_candidate_pairs"],
        "n_verified_edges": dd["n_verified_edges"],
        "n_kept": dd["n_kept"],
        "n_clean": n_clean,
        "export": export,
    }
