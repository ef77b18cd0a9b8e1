"""Medallion I/O: zones, sources, sinks (SURVEY §2.1).

The reference's S3 bucket with ``bronze/ silver/ gold/`` prefixes plus Glue
crawlers (data-lake-stack.yml:313-323, :218-276) becomes a warehouse
directory of Parquet tables plus the Spark catalog. Writers default to
Parquet partitioned on the business date — that single choice buys Athena's
two main optimizations (partition pruning + columnar scan) natively in
Spark at any scale.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZONES = ("bronze", "silver", "gold")


class Lake:
    """A warehouse root with bronze/silver/gold zones.

    Replaces the CloudFormation bucket+prefixes; ``register`` replaces the
    Glue crawlers (schema comes from the Parquet footer, not a crawl).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, zone: str, table: str) -> str:
        if zone not in ZONES:
            raise ValueError(f"unknown zone {zone!r}; expected one of {ZONES}")
        return os.path.join(self.root, zone, table)

    # --- sinks ------------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        zone: str,
        table: str,
        partition_by: Optional[list[str]] = None,
        mode: str = "overwrite",
        fmt: str = "parquet",
        bloom_cols: Optional[dict[str, int]] = None,
        options: Optional[dict[str, str]] = None,
    ) -> str:
        """S4/S5/S6/S10: zone sink, Parquet by default, optionally
        partitioned (bronze_ingest_streamate_mock.py:51-52 partitions on
        processing_date; silver JSON sinks silver_ingest_streamate_mock.py:99-111
        are supported via fmt='json' but Parquet is the default here).

        ``bloom_cols`` maps column → expected distinct count and writes a
        parquet bloom filter per column. For point lookups on hash-like
        keys (the P7 upsert probe: `_id` is effectively random), min/max
        row-group stats never prune — every row group spans the full key
        range — but the bloom filter skips all non-matching row groups at
        the reader (measured: 159× fewer rows decoded,
        tests/test_bloom_skipping.py). At 100 TB that turns a per-record
        dedup probe from a table scan into a handful of row groups."""
        out = self.path(zone, table)
        w = df.write.mode(mode)
        if options:
            for k, v in options.items():
                w = w.option(k, v)
        if bloom_cols and fmt == "parquet":
            for col, ndv in bloom_cols.items():
                w = w.option(f"parquet.bloom.filter.enabled#{col}", "true")
                w = w.option(
                    f"parquet.bloom.filter.expected.ndv#{col}", str(ndv)
                )
        if partition_by:
            w = w.partitionBy(*partition_by)
        getattr(w, fmt)(out)
        return out

    def overwrite_partitions(
        self,
        df: DataFrame,
        zone: str,
        table: str,
        partition_by: list[str],
    ) -> str:
        """Partition-scoped backfill: replace ONLY the partitions present
        in ``df``, leave every other partition untouched (dynamic
        partition overwrite). The reference rewrites the whole bronze
        table on every ingest (bronze_ingest_streamate_mock.py:51 mode
        'overwrite') — at 100 TB a one-day correction must rewrite one
        day, not the table."""
        out = self.path(zone, table)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(out)
        )
        return out

    # --- sources ----------------------------------------------------------

    def read(self, zone: str, table: str, fmt: str = "parquet") -> DataFrame:
        return getattr(self.spark.read, fmt)(self.path(zone, table))

    def exists(self, zone: str, table: str) -> bool:
        return os.path.exists(self.path(zone, table))

    def register(self, zone: str, table: str, fmt: str = "parquet") -> DataFrame:
        """S8: catalog registration — the crawler replacement."""
        df = self.read(zone, table, fmt)
        df.createOrReplaceTempView(f"{zone}_{table}")
        return df


def read_json_payload(
    spark: SparkSession,
    payload: dict | list | str,
    schema: Optional[T.StructType] = None,
) -> DataFrame:
    """S1: REST-API JSON payload → DataFrame
    (bronze_ingest_streamate_mock.py:28-33 does
    ``read.json(parallelize([json.dumps(api_response)]))``; same idea,
    schema optional — pass one in production to skip inference)."""
    text = payload if isinstance(payload, str) else json.dumps(payload)
    rdd = spark.sparkContext.parallelize([text])
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(rdd)


def fetch_json_payload(
    spark: SparkSession,
    url: str,
    body: Optional[dict] = None,
    headers: Optional[dict] = None,
    schema: Optional[T.StructType] = None,
    transport=None,
    timeout: float = 30.0,
) -> DataFrame:
    """S1, live form: POST ``body`` to ``url`` and land the JSON
    response as a DataFrame — the ``requests.post`` + ``read.json``
    step of the reference's bronze ingest
    (bronze_ingest_streamate_mock.py:28-33) as one call.

    ``transport`` is injectable — ``transport(url, body, headers,
    timeout) -> str`` — so ingest jobs unit-test against a stub and
    production swaps in its HTTP client (retries/auth live there, not
    here). The default transport is stdlib urllib: a driver-side fetch
    is the right shape for ONE control-plane payload per run (the
    reference's cadence); bulk HTTP ingest belongs in a source listing
    + distributed reads, never a driver loop."""
    if transport is None:

        def transport(u, b, h, t):  # pragma: no cover - needs network
            import urllib.request

            data = None if b is None else json.dumps(b).encode()
            req = urllib.request.Request(
                u,
                data=data,
                headers={"Content-Type": "application/json", **(h or {})},
                method="POST" if data is not None else "GET",
            )
            with urllib.request.urlopen(req, timeout=t) as resp:
                return resp.read().decode("utf-8")

    text = transport(url, body, headers, timeout)
    return read_json_payload(spark, text, schema)


def read_records(
    spark: SparkSession,
    records: list[dict],
    schema: Optional[T.StructType | str] = None,
) -> DataFrame:
    """S2: API row list → DataFrame (bronze_ingest_users_mock.py:19-22 goes
    through pandas; Spark takes the rows directly)."""
    if schema is not None:
        return spark.createDataFrame(records, schema=schema)
    return spark.createDataFrame(records)


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-on-read CSV with explicit malformed-row handling — the gold
    zone's Athena results are CSV (earnings.py OutputLocation), and feed
    files from partners arrive dirty. PERMISSIVE keeps bad rows with the
    raw line captured in ``_corrupt_record`` (quarantine-able downstream);
    DROPMALFORMED silently filters them; FAILFAST turns the first bad row
    into a job error. Never infer the schema in production paths — one
    pass of inference over 100 TB is a full extra scan."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if mode == "PERMISSIVE":
        base = (
            schema
            if isinstance(schema, T.StructType)
            else T.StructType.fromDDL(schema)
        )
        schema = base.add("_corrupt_record", T.StringType())
    return reader.schema(schema).csv(path)


def quarantine_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantined) — clean rows
    drop the corrupt column; quarantined rows keep only the raw line for
    a dead-letter table. The medallion move: bronze keeps everything,
    quarantine is itself a table you can re-parse after a schema fix."""
    # Spark refuses to answer queries that reference ONLY the internal
    # corrupt-record column of a raw CSV/JSON scan; materialize first.
    df = df.cache()
    corrupt = F.col("_corrupt_record").isNotNull()
    clean = df.filter(~corrupt).drop("_corrupt_record")
    bad = df.filter(corrupt).select("_corrupt_record")
    return clean, bad


# --- table maintenance ------------------------------------------------------


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ceil(bytes/target) files. The reference's per-record upsert sink
    (ingestStreamateModelPerformance.py:161-169, one S3 object per record)
    is exactly the pattern that degrades a lake at scale — a million tiny
    objects turn every scan into metadata churn. Run this per
    partition-directory after incremental ingest; 128 MB targets align
    file and HDFS/S3 read-granularity. Returns the new file count.

    (Plain-parquet stand-in for Delta OPTIMIZE / bin-packing.)
    """
    size = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (same filesystem)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the footers of every file so late
    columns (added by newer writers) surface as nulls on old rows — the
    crawler's schema-drift behavior (data-lake-stack.yml:218-276), native
    to parquet via mergeSchema. Pay the footer fan-in only where drift is
    real; a fixed-schema read stays the default."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def mongo_connector_available(spark: SparkSession) -> bool:
    """True when the MongoDB Spark connector jar is on the session's
    classpath (the `mongodb` DataSource registers via Java SPI)."""
    try:
        jvm = spark._jvm
        jvm.Thread.currentThread().getContextClassLoader().loadClass(
            "com.mongodb.spark.sql.connector.MongoTableProvider"
        )
        return True
    except Exception:
        return False


def read_mongo_dim(
    spark: SparkSession, uri: str, database: str, collection: str
) -> DataFrame:
    """S9 MongoDB dimension source (reference: Glue jobs pull
    users/offices/cities/rooms collections over a NETWORK connection,
    data-lake-stack.yml:62-148, connection 205-216).

    HONESTY CONTRACT: this sandbox does not ship the MongoDB Spark
    connector, so here this raises RuntimeError with a clear message.
    On a cluster with ``org.mongodb.spark:mongo-spark-connector`` on
    the classpath the same call becomes the real partitioned reader
    (connector splits on _id ranges; predicates/projections push down
    to Mongo aggregation). The OFFLINE form of S9 — the same
    collections as mongodump ``.bson`` interchange files — is fully
    implemented in-sandbox by ``data_lake_spark.bsondump.read_bson_dump``
    (dependency-free public-spec walker; oracle-paired via
    ``queries/mongo_q.mongo_dim_conform``)."""
    if not mongo_connector_available(spark):
        raise RuntimeError(
            "MongoDB Spark connector not on the classpath; S9 dims are "
            "modeled as parquet inputs in this environment (SURVEY §1.5). "
            "Add org.mongodb.spark:mongo-spark-connector to use this reader."
        )
    return (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .load()
    )
