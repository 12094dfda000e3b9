"""Multimodal plumbing: schema, mapInPandas batching, determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from heracles_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i}") for i in range(20)],
        "doc_id long, text string")
    return multimodal.attach_media_stub(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "content", "media"]
    meta = media.schema["media"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type", "format", "width", "height", "duration_ms", "sample_rate"]
    row = media.first()
    assert bytes(row["content"]).decode("utf-8").startswith("document body")
    assert 1 <= row["media"]["width"] <= 512


def test_decode_deterministic(media):
    a = {r["doc_id"]: r["feature"]
         for r in multimodal.decode_image_features(media).collect()}
    b = {r["doc_id"]: r["feature"]
         for r in multimodal.decode_image_features(
             media.repartition(7)).collect()}
    assert a == b                      # partitioning-independent
    assert len(a[0]) == 8


def test_decode_n_bytes(media):
    got = {r["doc_id"]: r["n_bytes"]
           for r in multimodal.decode_image_features(media).collect()}
    assert got[5] == len("document body number 5")


def test_pil_decoder_stubbed(media):
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image_features(media, decoder="pil")


def test_frame_sample_plan(spark):
    docs = spark.createDataFrame(
        [(1, "x")], "doc_id long, text string")
    m = multimodal.attach_media_stub(docs).withColumn(
        "media", F.struct(
            F.lit("video").alias("media_type"), F.lit("mp4").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(3500).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate")))
    frames = multimodal.frame_sample_plan(m, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
