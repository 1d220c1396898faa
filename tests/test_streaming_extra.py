"""Streaming semantics beyond the oracle checks: watermark late-data
dropping, plus container/source coverage (ORC, Avro, permissive CSV)
and the multimodal resize/frame-sample plumbing."""

from __future__ import annotations

import pytest

try:
    import google.protobuf  # noqa: F401

    _HAVE_PROTOBUF = True
except ImportError:
    _HAVE_PROTOBUF = False


def test_transform_with_state_gate_or_oracle(spark, duck, sf_dir):
    """transformWithStateInPandas: exact per-user running totals when
    google-protobuf is available; a clear RuntimeError gate when not
    (this sandbox lacks it — same honest-gate pattern as the codec
    stubs)."""
    from hadoop_3_3_6_spark.streaming.windows import streaming_transform_with_state

    if not _HAVE_PROTOBUF:
        with pytest.raises(RuntimeError, match="protobuf"):
            streaming_transform_with_state(spark, sf_dir)
        return
    from hadoop_3_3_6_spark.plans.queries import ORACLES
    from tests.util import assert_frames_match

    got = streaming_transform_with_state(spark, sf_dir).toPandas()
    want = duck.execute(ORACLES["streaming_transform_with_state"]).df()
    assert_frames_match(got, want, "streaming_transform_with_state")

import pytest
from pyspark.sql import functions as F


def test_watermark_drops_late_data(spark, tmp_path):
    """Aggregations drop events older than the watermark: micro-batch 1
    advances event time far ahead; micro-batch 2 delivers a very late
    event, which must NOT appear in the final windows (SURVEY.md §2.9
    'watermarks + late-data dropping')."""
    import time

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_batch(name: str, rows):
        df = spark.createDataFrame(rows, "id long, ts_s string").select(
            "id", F.to_timestamp("ts_s").alias("ts")
        )
        df.coalesce(1).write.parquet(str(src / name))
        time.sleep(1.1)  # later mtime -> later micro-batch (arrival order)

    # watermark commits lag one batch: batch N filters with the
    # watermark computed from batches <= N-1, so the late row goes in
    # the third batch (after 12:00-10min has committed).
    write_batch("b0", [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")])
    write_batch("b1", [(4, "2024-01-01 12:30:00")])
    write_batch("b2", [(3, "2024-01-01 09:00:00")])  # hours late vs 10-min watermark

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src / "b*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "late_drop_t"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append emits only finalized (watermark-passed) windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    rows = spark.table(name).select(F.col("w.start").cast("string").alias("ws"), "n").collect()
    finalized = {r["ws"]: r["n"] for r in rows}
    assert dropped == 1, f"late row not dropped (dropped={dropped}, windows={finalized})"
    # the 09:00 late event's window must never be emitted
    assert "2024-01-01 09:00:00" not in finalized
    assert finalized.get("2024-01-01 10:00:00") == 1


def test_orc_roundtrip(spark, tmp_path):
    df = spark.range(100).select("id", (F.col("id") % 5).alias("g"))
    p = str(tmp_path / "orc")
    df.write.orc(p)
    assert spark.read.orc(p).agg(F.sum("id")).collect()[0][0] == 4950


def test_avro_roundtrip(spark, tmp_path):
    pytest.importorskip("pyspark")
    df = spark.range(50).select("id", F.concat(F.lit("r"), F.col("id")).alias("name"))
    p = str(tmp_path / "avro")
    try:
        df.write.format("avro").save(p)
    except Exception:
        pytest.skip("spark-avro format provider not bundled")
    assert spark.read.format("avro").load(p).count() == 50


def test_permissive_csv_bad_records(spark, tmp_path):
    """SkipBadRecords at the reader tier (SURVEY.md §2.3): PERMISSIVE
    mode captures malformed rows instead of failing the job."""
    p = tmp_path / "data.csv"
    p.write_text("1,alpha\n2,beta\nnot_an_int,gamma\n4,delta\n")
    df = (
        spark.read.schema("k int, v string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 3 and len(bad) == 1
    assert bad[0]["_corrupt_record"].startswith("not_an_int")


def test_multimodal_resize_and_frames(spark):
    from hadoop_3_3_6_spark.functions.multimodal import resize_images, sample_frames

    df = spark.createDataFrame(
        [(1, bytes(range(200))), (2, bytes(200))], "doc_id long, payload binary"
    )
    thumbs = resize_images(df, width=8, height=8).collect()
    assert all(r["n_bytes"] == 64 for r in thumbs)
    # deterministic: same payload -> same thumbnail
    again = {r["doc_id"]: bytes(r["thumbnail"]) for r in resize_images(df, width=8, height=8).collect()}
    assert {r["doc_id"]: bytes(r["thumbnail"]) for r in thumbs} == again
    frames = sample_frames(df, every_n=3).collect()
    # 200 bytes -> 13 16-byte frames -> every 3rd -> 5 per doc
    assert len(frames) == 10
    assert {r["frame_idx"] for r in frames} == {0, 1, 2, 3, 4}


def test_custom_stream_source_exactly_once_drain(spark, tmp_path):
    """Custom Python streaming source (SimpleDataSourceStreamReader):
    offset-bounded micro-batches drain the full range exactly once —
    no gaps, no duplicates — and stop advancing at max_rows."""
    import time
    import uuid as _uuid

    from hadoop_3_3_6_spark.sources.streamsource import register_range_stream

    register_range_stream(spark)
    name = "rs" + _uuid.uuid4().hex[:10]
    q = (
        spark.readStream.format("rangestream")
        .option("batch_size", "700")
        .option("max_rows", "3000")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c >= 3000:
                break
            time.sleep(0.5)
        time.sleep(2)  # run the post-drain empty-read path
        assert q.exception() is None  # end-of-stream reads must not error
        rows = spark.sql(f"SELECT n, h FROM {name}").collect()
    finally:
        q.stop()
    assert len(rows) == 3000
    assert {r.n for r in rows} == set(range(3000))
    assert all(r.h == r.n * r.n % 997 for r in rows)
