"""Nested-feed flatten (SURVEY §2.10 N1) — the silver conform step.

The reference flattens the studios→performers→earnings feed by
``collect()``-ing the whole DataFrame to the driver and looping in Python
(``/root/reference/src/glue_jobs/streamate/silver_ingest_streamate_mock.py:46-86``)
— the #1 scaling bug SURVEY §4 flags. Here the same three outputs are pure
``explode`` chains: fully distributed, whole-stage-codegen'd, ~8 lines
each. Input schema matches ``api/streamate.json:1-38``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The bronze feed schema (FIXTURES.md §A streamate_feed).
STREAMATE_FEED_SCHEMA = T.StructType(
    [
        T.StructField(
            "studios",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("studioId", T.IntegerType()),
                        T.StructField("emailAddress", T.StringType()),
                        T.StructField(
                            "earnings",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("date", T.StringType()),
                                        T.StructField("payableAmount", T.DoubleType()),
                                    ]
                                )
                            ),
                        ),
                        T.StructField(
                            "performers",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("performerId", T.IntegerType()),
                                        T.StructField("nickname", T.StringType()),
                                        T.StructField("emailAddress", T.StringType()),
                                        T.StructField(
                                            "earnings",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("date", T.StringType()),
                                                        T.StructField("onlineSeconds", T.IntegerType()),
                                                        T.StructField("payableAmount", T.DoubleType()),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField("data_timestamp", T.LongType()),
    ]
)


def flatten_studio_earnings(feed: DataFrame) -> DataFrame:
    """silver/studios_earnings (reference silver_ingest_streamate_mock.py:57-62):
    studios[].earnings[] → (studioId, emailAddress, date, payableAmount)."""
    return (
        feed.select(F.explode("studios").alias("s"))
        .select(
            "s.studioId",
            "s.emailAddress",
            F.explode("s.earnings").alias("e"),
        )
        .select("studioId", "emailAddress", "e.date", "e.payableAmount")
    )


def flatten_performer_earnings(feed: DataFrame) -> DataFrame:
    """silver/earnings_by_performer pre-join shape
    (silver_ingest_streamate_mock.py:66-86): studios[].performers[].earnings[]
    → (performerId, nickname, emailAddress, date, onlineSeconds, payableAmount)."""
    return (
        feed.select(F.explode("studios").alias("s"))
        .select(F.explode("s.performers").alias("p"))
        .select(
            "p.performerId",
            "p.nickname",
            "p.emailAddress",
            F.explode("p.earnings").alias("e"),
        )
        .select(
            "performerId",
            "nickname",
            "emailAddress",
            "e.date",
            "e.onlineSeconds",
            "e.payableAmount",
        )
    )


def conform_earnings_by_performer(feed: DataFrame, users: DataFrame) -> DataFrame:
    """The J1 silver conform (silver_ingest_streamate_mock.py:89-90):
    performer earnings ⟕ users on emailAddress = streamateUser, keeping the
    user's _id. users is dim-sized → broadcast."""
    perf = flatten_performer_earnings(feed)
    u = F.broadcast(users.select("streamateUser", "_id"))
    return perf.join(
        u, perf.emailAddress == u.streamateUser, "left_outer"
    ).select(
        "performerId",
        "nickname",
        "emailAddress",
        "date",
        "onlineSeconds",
        "payableAmount",
        "_id",
    )
