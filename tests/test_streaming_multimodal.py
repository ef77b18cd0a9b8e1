"""Structured Streaming ingest + multimodal plumbing (M2/M4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_spark.catalog import load_table
from data_lake_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    frame_sample,
)
from data_lake_spark.operators.upsert import keep_latest
from data_lake_spark.streaming.incremental import (
    sessionize,
    start_file_ingest,
    windowed_event_rollup,
)


def _events_ts(spark, sf_dir):
    """events with a real timestamp col (parquet ns → long; see session.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))


def test_windowed_rollup_batch(spark, sf_dir):
    out = windowed_event_rollup(_events_ts(spark, sf_dir), window="1 hour").collect()
    assert len(out) > 0
    assert all(r.n_events > 0 for r in out)
    # every window is exactly 1 hour
    assert all((r.window_end - r.window_start).total_seconds() == 3600 for r in out)


def test_windowed_rollup_streaming(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    _events_ts(spark, sf_dir).limit(500).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_rollup(stream, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) c FROM rollup_out").first().c
        assert n > 0
    finally:
        q.stop()


def test_file_ingest_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.range(50).withColumn("v", F.col("id") * 2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    seen = {}

    def handler(batch_df, epoch_id):
        seen["rows"] = batch_df.count()

    q = start_file_ingest(
        spark, src, schema, str(tmp_path / "ckpt"), handler, trigger_available_now=True
    )
    q.awaitTermination(120)
    assert seen["rows"] == 50
    # second run with same checkpoint: bookmark skips processed files
    seen["rows"] = -1
    q2 = start_file_ingest(
        spark, src, schema, str(tmp_path / "ckpt"), handler, trigger_available_now=True
    )
    q2.awaitTermination(120)
    assert seen["rows"] in (-1, 0)  # no new data → handler not called or empty


def test_sessionize(spark, sf_dir):
    out = sessionize(_events_ts(spark, sf_dir).limit(2000), gap_minutes=30)
    row = out.filter(F.col("session_id").isNotNull()).first()
    assert row is not None
    per_user = out.groupBy("user_id").agg(F.countDistinct("session_id").alias("n"))
    assert per_user.filter(F.col("n") < 1).count() == 0


def test_multimodal_decode_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(60)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["content"] == "binary"
    # real mode on this corpus must fail loudly at execution: the content
    # is text bytes (not an image container), and audio/video rows have
    # no codec here — never a silent fake
    with pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        decode_media(media).collect()
    decoded = decode_media(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 60
    assert all(len(r.embedding) == 16 for r in rows)
    assert all(len(r.sha256) == 64 for r in rows)
    # determinism: same bytes → same fake decode
    again = {r.media_id: r.sha256 for r in decode_media(media, fake=True).collect()}
    assert all(again[r.media_id] == r.sha256 for r in rows)
    # videos have frames; images/audio exactly 1
    kinds = {r.media_id: (r.kind, r.n_frames) for r in rows}
    assert all(nf == 1 for k, nf in kinds.values() if k != "video")


def _make_png(w: int, h: int) -> bytes:
    """A fully valid (zlib-compressed, CRC-correct) RGB PNG fixture."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_multimodal_decode_real_images(spark):
    """Real decode path: true container dimensions (header parser or PIL)
    and a byte-histogram feature — on genuine image bytes."""
    import struct as _s

    png = _make_png(37, 21)
    gif = b"GIF89a" + _s.pack("<HH", 320, 200) + b"\x00" * 20
    bmp = b"BM" + b"\x00" * 16 + _s.pack("<ii", 17, -9) + b"\x00" * 20
    rows = [
        (1, "image", bytearray(png), ("image/png", len(png), "mem://png")),
        (2, "image", bytearray(gif), ("image/gif", len(gif), "mem://gif")),
        (3, "image", bytearray(bmp), ("image/bmp", len(bmp), "mem://bmp")),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,n_bytes:long,source_uri:string>",
    )
    got = {r.media_id: r for r in decode_media(media).collect()}
    assert (got[1].width, got[1].height) == (37, 21)
    assert (got[2].width, got[2].height) == (320, 200)
    assert (got[3].width, got[3].height) == (17, 9)  # top-down DIB abs()
    for r in got.values():
        assert r.n_frames == 1
        assert len(r.embedding) == 16
        assert abs(sum(r.embedding) - 1.0) < 1e-6  # normalized histogram


def test_image_dimensions_header_parser():
    import struct as _s

    from data_lake_spark.operators.multimodal import image_dimensions

    assert image_dimensions(_make_png(640, 480)) == (640, 480)
    # minimal JPEG: SOI, SOF0 segment carrying (precision, H, W, ncomp)
    sof0 = b"\xff\xc0" + _s.pack(">H", 17) + b"\x08" + _s.pack(">HH", 99, 123)
    jpeg = b"\xff\xd8" + sof0 + b"\x03" + b"\x00" * 12 + b"\xff\xd9"
    assert image_dimensions(jpeg) == (123, 99)
    assert image_dimensions(b"not an image at all") is None


def test_resize_images_stub(spark, sf_dir):
    from data_lake_spark.catalog import load_table
    from data_lake_spark.operators.multimodal import documents_as_media, resize_images

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        resize_images(media, 224, 224).collect()
    out = resize_images(media, 224, 224, fake=True)
    rows = out.collect()
    assert rows and all(r.width == 224 and r.height == 224 for r in rows)
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images  # only images pass through
    # deterministic under repartitioning (digest-derived, no state)
    again = resize_images(media.repartition(5), 224, 224, fake=True)
    assert sorted(r.resized_sha for r in rows) == sorted(
        r.resized_sha for r in again.collect()
    )


def test_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(60)
    decoded = decode_media(documents_as_media(docs), fake=True)
    frames = frame_sample(decoded, every_n=4).collect()
    assert all(r.frame_idx % 4 == 0 for r in frames)


def test_keep_latest_on_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    latest = keep_latest(ev, ["user_id", "event_type"], "ts", tiebreak=["event_id"])
    assert latest.groupBy("user_id", "event_type").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_sessionize_stateful_two_batches(spark, tmp_path):
    """Closed sessions emit across micro-batch boundaries; totals match
    the batch sessionizer's exact sums."""
    from data_lake_spark.streaming.incremental import sessionize_stateful

    src = str(tmp_path / "sess_src")
    schema = "user_id long, ts long, value double"
    # batch 1: user 1 has two sessions (gap 7200 > 1800), second still open
    # one file per micro-batch: the operator assumes event-time-ordered
    # arrival across batches (append logs); a multi-file batch would be
    # picked up in arbitrary file order
    spark.createDataFrame(
        [(1, 1000, 1.25), (1, 1300, 2.50), (1, 9000, 4.00)], schema
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        sessionize_stateful(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        assert first == {(1, 1000): (1300, 2, 3.75)}
        # batch 2: an event far past 9000 closes the open session
        spark.createDataFrame([(1, 20000, 8.0)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        both = {
            (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        assert both == {
            (1, 1000): (1300, 2, 3.75),
            (1, 9000): (9000, 1, 4.0),
        }
    finally:
        q.stop()


def test_windowed_rollup_restart_recovery(spark, sf_dir, tmp_path):
    """Exactly-once across a crash/restart: a STATEFUL windowed
    aggregation stopped mid-stream resumes from its checkpoint, folds in
    only the files that arrived while it was down, and the final state
    equals one batch pass over everything — the property that lets a
    100 TB ingest survive executor loss and planned restarts without
    reprocessing or double counting."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = _events_ts(spark, sf_dir).select("ts", "event_type", "value")
    first, second = ev.limit(600), ev.subtract(ev.limit(600)).limit(400)
    first.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_until_drained(name):
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_event_rollup(stream, window="1 hour")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_drained("recov_a")
    n_first = spark.sql("SELECT SUM(n_events) n FROM recov_a").first().n
    assert n_first == 600

    # "crash" happened (query stopped); new data lands while we're down
    second.coalesce(1).write.mode("append").parquet(src)
    run_until_drained("recov_b")

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM recov_b").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_rollup(
            spark.read.parquet(src), window="1 hour"
        ).collect()
    }
    assert got == want  # bit-identical totals: exact sums, no dup/no loss


def _make_wav(rate: int, channels: int, n_samples: int) -> bytes:
    import struct

    bits = 16
    data = b"\x00\x00" * n_samples * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_real_wav_decode(spark):
    """Real audio metadata from the RIFF header: sample_rate/channels land
    in (width, height) with no codec library; non-WAV audio still raises."""
    from data_lake_spark.operators.multimodal import decode_media, wav_info

    wav = _make_wav(16000, 2, 800)
    assert wav_info(wav) == (16000, 2, 800)
    assert wav_info(b"not a wav at all") is None

    media = spark.createDataFrame(
        [(1, "audio", wav, '{"src":"unit"}')],
        "media_id long, kind string, content binary, meta string",
    )
    row = decode_media(media).first()
    assert (row.width, row.height) == (16000, 2)
    assert row.n_frames == 1
    assert abs(sum(row.embedding) - 1.0) < 1e-6  # normalized (float32 storage)
