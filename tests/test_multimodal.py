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


def test_decode_audio_features(spark):
    from heracles_spark.operators import multimodal as mm

    d = spark.createDataFrame([(1, "hello world"), (2, "other")],
                              "doc_id long, text string")
    media = mm.attach_media_stub(d)
    feats = mm.decode_audio_features(media).collect()
    assert len(feats) == 2
    r = {f["doc_id"]: f for f in feats}
    assert r[1]["n_bytes"] == len(b"hello world")
    assert len(r[1]["mfcc_ish"]) == 13
    assert 0.0 <= r[1]["rms"] <= 1.0
    # deterministic: same content -> same features
    again = {f["doc_id"]: f for f in
             mm.decode_audio_features(media).collect()}
    assert again[1]["mfcc_ish"] == r[1]["mfcc_ish"]


def test_resize_images_shape(spark):
    from heracles_spark.operators import multimodal as mm

    d = spark.createDataFrame([(1, "abc"), (2, None)],
                              "doc_id long, text string")
    media = mm.attach_media_stub(d.where(F.col("text").isNotNull()))
    out = mm.resize_images(media, out_w=8, out_h=4).collect()
    assert all(len(bytes(r["content"])) == 32 for r in out)
    assert all((r["out_w"], r["out_h"]) == (8, 4) for r in out)


def test_real_decoders_gated(spark):
    import pytest as _pytest

    from heracles_spark.operators import multimodal as mm

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = mm.attach_media_stub(d)
    for fn in (lambda: mm.decode_audio_features(media, decoder="librosa"),
               lambda: mm.resize_images(media, 2, 2, decoder="pil")):
        with _pytest.raises(NotImplementedError):
            fn()


# -- real pure-numpy codecs (operators.media_codecs) ----------------------

def test_wav_roundtrip_exact():
    import numpy as np

    from heracles_spark.operators import media_codecs as mc

    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, size=321).astype(np.int16)
    raw = mc.encode_wav_pcm16(s, 16000)
    back, rate, ch = mc.decode_wav_pcm16(raw)
    assert rate == 16000 and ch == 1
    assert np.array_equal(back[:, 0], s)
    # stereo
    st = rng.randint(-32768, 32768, size=64).astype(np.int16)
    raw2 = mc.encode_wav_pcm16(st, 8000, n_channels=2)
    back2, rate2, ch2 = mc.decode_wav_pcm16(raw2)
    assert (rate2, ch2) == (8000, 2) and back2.shape == (32, 2)
    assert np.array_equal(back2.reshape(-1), st)


def test_wav_rejects_non_pcm():
    import pytest as _pytest

    from heracles_spark.operators import media_codecs as mc

    with _pytest.raises(ValueError):
        mc.decode_wav_pcm16(b"not a wav")


def test_bmp_roundtrip_with_row_padding():
    import numpy as np

    from heracles_spark.operators import media_codecs as mc

    # width 3 -> 9-byte rows padded to 12: exercises the pad path
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(5, 3, 3)).astype(np.uint8)
    assert np.array_equal(mc.decode_bmp24(mc.encode_bmp24(px)), px)


def test_bmp_image_features_golden(spark):
    import numpy as np

    from heracles_spark.operators import media_codecs as mc
    from heracles_spark.operators import multimodal as mm

    # Uniform mid-gray image: luma == 100 exactly, histogram all in one bin.
    px = np.full((4, 4, 3), 100, dtype=np.uint8)
    raw = mc.encode_bmp24(px)
    df = spark.createDataFrame([(7, bytearray(raw))],
                               "doc_id long, content binary")
    r = mm.decode_image_features(df, decoder="bmp", feature_dim=4).collect()[0]
    assert r["n_bytes"] == len(raw)
    assert abs(r["mean_luma"] - 100.0 / 255.0) < 1e-9
    assert [round(v, 6) for v in r["feature"]] == [0.0, 1.0, 0.0, 0.0]


def test_wav_audio_features_golden(spark):
    import numpy as np

    from heracles_spark.operators import media_codecs as mc
    from heracles_spark.operators import multimodal as mm

    amp = 12345
    s = np.full(64, amp, dtype=np.int16)
    s[1::2] = -amp
    raw = mc.encode_wav_pcm16(s, 8000)
    df = spark.createDataFrame([(9, bytearray(raw))],
                               "doc_id long, content binary")
    r = mm.decode_audio_features(df, decoder="wav").collect()[0]
    assert r["n_bytes"] == 44 + 128
    assert abs(r["rms"] - amp / 32768.0) < 1e-12


def test_bmp_resize_nearest_golden(spark):
    import numpy as np

    from heracles_spark.operators import media_codecs as mc
    from heracles_spark.operators import multimodal as mm

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    df = spark.createDataFrame([(1, bytearray(mc.encode_bmp24(px)))],
                               "doc_id long, content binary")
    r = mm.resize_images(df, out_w=2, out_h=2, decoder="bmp").collect()[0]
    out = mc.decode_bmp24(bytes(r["content"]))
    assert np.array_equal(out, px[::2, ::2])


def test_ppm_pgm_decode_features(spark):
    import numpy as np

    from heracles_spark.operators import media_codecs as mc
    from heracles_spark.operators.multimodal import decode_image_features

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[..., 0] = 255                        # pure red
    gray = np.full((3, 5), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(mc.encode_ppm(rgb))),
         (2, bytearray(mc.encode_pgm(gray)))],
        "doc_id long, content binary")
    out = {r.doc_id: r for r in
           decode_image_features(df, decoder="ppm").collect()}
    assert abs(out[1].mean_luma - 0.299) < 1e-6     # red luma
    assert abs(out[2].mean_luma - 100 / 255.0) < 1e-6
    assert abs(sum(out[1].feature) - 1.0) < 1e-6


def test_mulaw_wav_decode_features(spark):
    import numpy as np

    from heracles_spark.operators import media_codecs as mc
    from heracles_spark.operators.multimodal import decode_audio_features

    x = (np.sin(np.linspace(0, 30, 800)) * 15000).astype(np.int16)
    blob = mc.encode_wav_mulaw(x, 8000)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "doc_id long, content binary")
    row = decode_audio_features(df, decoder="wav").collect()[0]
    want_rms = float(np.sqrt(np.mean(
        (mc.decode_mulaw(mc.encode_mulaw(x)).astype(np.float64)
         / 32768.0) ** 2)))
    assert abs(row.rms - want_rms) < 1e-9
    assert len(row.mfcc_ish) == 13


def test_resize_ppm_roundtrip(spark):
    import numpy as np

    from heracles_spark.operators import media_codecs as mc
    from heracles_spark.operators.multimodal import resize_images

    px = (np.arange(8 * 8 * 3) % 256).astype(np.uint8).reshape(8, 8, 3)
    df = spark.createDataFrame([(1, bytearray(mc.encode_ppm(px)))],
                               "doc_id long, content binary")
    row = resize_images(df, 4, 4, decoder="ppm").collect()[0]
    small = mc.decode_netpbm(bytes(row.content))
    assert small.shape == (4, 4, 3)
    assert (small == px[::2][:, ::2]).all()


def test_qoi_roundtrip_all_ops():
    import numpy as np

    from heracles_spark.operators.media_codecs import (decode_qoi,
                                                       encode_qoi)

    rng = np.random.default_rng(42)
    for shape in [(5, 7, 3), (4, 4, 4), (1, 1, 3), (8, 3, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        img[1:3] = img[0]                       # runs
        out = decode_qoi(encode_qoi(img))
        assert out.shape == img.shape and (out == img).all()
    # smooth gradient: DIFF/LUMA ops dominate
    g = np.zeros((16, 16, 3), np.uint8)
    for y in range(16):
        for x in range(16):
            g[y, x] = (x * 2 + y, x * 2 + y + 1, x * 2 + y)
    assert (decode_qoi(encode_qoi(g)) == g).all()
    # alpha changes force RGBA ops
    a = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
    a[..., 3] = rng.integers(0, 256, (3, 3), dtype=np.uint8)
    assert (decode_qoi(encode_qoi(a)) == a).all()


def test_qoi_header_and_run_encoding():
    import numpy as np
    import struct

    from heracles_spark.operators.media_codecs import encode_qoi

    img = np.full((8, 8, 3), 0, np.uint8)       # solid black
    raw = encode_qoi(img)
    assert raw[:4] == b"qoif"
    w, h, ch, cs = struct.unpack(">IIBB", raw[4:14])
    assert (w, h, ch, cs) == (8, 8, 3, 0)
    # black == QOI initial state: the whole image is runs (62 + 2)
    assert raw[14] == 0xC0 | 61 and raw[15] == 0xC0 | 1
    assert raw[-8:] == b"\x00" * 7 + b"\x01"


def test_qoi_decode_through_operator(spark):
    import numpy as np
    import pandas as pd

    from heracles_spark.operators import multimodal
    from heracles_spark.operators.media_codecs import encode_qoi

    img = np.full((4, 4, 3), 100, np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "content": [encode_qoi(img)]}))
    row = multimodal.decode_image_features(df, decoder="qoi").collect()[0]
    assert row["mean_luma"] == 100.0 / 255.0
