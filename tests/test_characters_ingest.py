"""The reference's second API fixture shape (api/characters.json:10-79):
records with nested structs (origin/location), a string array (episode),
and an ISO timestamp (created) — ingested via schema inference, then
queried with struct access (SURVEY §2.10 N2) and array/timestamp ops.
Payload data here is synthetic; only the SHAPE mirrors the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_spark.io import read_json_payload

PAYLOAD = [
    {
        "id": 1,
        "name": "Alpha One",
        "status": "Alive",
        "species": "Human",
        "origin": {"name": "Earth", "url": "mem://loc/1"},
        "location": {"name": "Citadel", "url": "mem://loc/9"},
        "episode": ["mem://ep/1", "mem://ep/2", "mem://ep/3"],
        "created": "2017-11-04T18:48:46.250Z",
    },
    {
        "id": 2,
        "name": "Beta Two",
        "status": "unknown",
        "species": "Alien",
        "origin": {"name": "unknown", "url": ""},
        "location": {"name": "Earth", "url": "mem://loc/1"},
        "episode": ["mem://ep/2"],
        "created": "2018-01-10T12:00:00.000Z",
    },
]


def test_nested_schema_inference_and_access(spark):
    df = read_json_payload(spark, PAYLOAD)
    # inference produced the nested types the Glue crawler would
    assert isinstance(df.schema["origin"].dataType, T.StructType)
    assert isinstance(df.schema["episode"].dataType, T.ArrayType)
    out = {
        r.name: (r.origin_name, r.n_episodes, r.created_year)
        for r in df.select(
            "name",
            F.col("origin.name").alias("origin_name"),  # N2 struct access
            F.size("episode").alias("n_episodes"),
            F.year(F.to_timestamp("created")).alias("created_year"),
        ).collect()
    }
    assert out == {
        "Alpha One": ("Earth", 3, 2017),
        "Beta Two": ("unknown", 1, 2018),
    }


def test_orc_zone_roundtrip(spark, tmp_path):
    # second columnar format through the same zone API (fmt is generic)
    from data_lake_spark.io import Lake

    lake = Lake(spark, str(tmp_path / "lake"))
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    lake.write(df, "silver", "t_orc", fmt="orc")
    back = lake.read("silver", "t_orc", fmt="orc")
    assert sorted(r.v for r in back.collect()) == [i * 2 for i in range(10)]


def test_binaryfile_media_source(spark, tmp_path):
    from data_lake_spark.operators.multimodal import decode_media, read_media_dir

    d = tmp_path / "blobs"
    d.mkdir()
    payloads = {f"img_{i}.bin": bytes([i]) * (100 + i) for i in range(3)}
    for name, blob in payloads.items():
        (d / name).write_bytes(blob)
    media = read_media_dir(spark, str(d))
    rows = media.collect()
    assert len(rows) == 3
    assert len({r.media_id for r in rows}) == 3  # distinct stable ids
    by_uri = {r.meta.source_uri.rsplit("/", 1)[-1]: r for r in rows}
    for name, blob in payloads.items():
        assert bytes(by_uri[name].content) == blob
        assert by_uri[name].meta.n_bytes == len(blob)
    # flows straight into the decode stage
    decoded = decode_media(media, fake=True)
    assert decoded.count() == 3


def test_episode_membership_explode(spark):
    df = read_json_payload(spark, PAYLOAD)
    # who appears in episode 2 — array explode + filter, the crawler
    # table's only interesting query shape
    hits = sorted(
        r.name
        for r in df.select("name", F.explode("episode").alias("ep"))
        .filter(F.col("ep") == "mem://ep/2")
        .collect()
    )
    assert hits == ["Alpha One", "Beta Two"]
