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
