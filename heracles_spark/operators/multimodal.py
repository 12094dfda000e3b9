"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed via Arrow-batched
``mapInPandas`` — the Pandas-UDF slow path used only where built-ins
genuinely can't express the work (byte decoding).

Decoders: ``decoder="wav"``/``"bmp"`` are REAL (pure-numpy RIFF/PCM-16
and 24-bit-BMP codecs in operators.media_codecs — bytes in,
samples/pixels out, golden- and oracle-checked); ``decoder="fake"``
produces deterministic features from the bytes' hash for formats with
no in-container codec (the Spark-side plumbing — schema, batch
iteration, partition behavior — is identical); ``decoder="pil"``/
"librosa" raise NotImplementedError until those libs exist.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
binary blobs should be size-capped per batch via
spark.sql.execution.arrow.maxRecordsPerBatch to bound executor memory.
At 100 TB the blobs live in object storage and the table holds
(uri, byte_range) pointers; ``attach_media_stub`` models the inline-
bytes variant used for thumbnails/short clips.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|jpg|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def attach_media_stub(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake media column from text bytes — stands
    in for a real (content BINARY, media MEDIA_META) pair so downstream
    plumbing is exercised end-to-end."""
    content = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        (F.pmod(F.xxhash64(F.col(text_col)), F.lit(512)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.col(text_col), F.lit(1)), F.lit(512)) + 1).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"))
    return df.select(F.col(id_col), content.alias("content"), meta.alias("media"))


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          content_col: str = "content",
                          decoder: Literal["fake", "bmp", "ppm", "qoi",
                                           "png", "gif",
                                           "pil"] = "fake",
                          feature_dim: int = 8) -> DataFrame:
    """mapInPandas image decode → per-image features.

    Decoders:
      * "bmp"  — REAL decode (operators.media_codecs, pure numpy):
        mean_luma = Rec.601 luma of the actual pixels in [0,1];
        feature = the gray-level histogram (feature_dim equal bins,
        normalized to sum 1).
      * "ppm"  — REAL decode of binary netpbm (PPM P6 RGB / PGM P5
        gray), same features as "bmp".
      * "qoi"  — REAL decode of QOI (qoiformat.org; full op set in
        operators.media_codecs), same features; RGBA alpha is ignored
        for luma.
      * "png"  — REAL decode of PNG (zlib DEFLATE inflate, CRC-checked
        chunk walk, full None/Sub/Up/Average/Paeth unfilter matrix),
        same features; grayscale (color type 0) handled like PGM.
      * "gif"  — REAL decode of GIF (sub-block reassembly + full LZW:
        dictionary growth, code-width stepping, clear-code reset),
        same features.
      * "fake" — deterministic features from the bytes' hash (plumbing
        tests for formats without an in-container codec).
      * "pil"  — the slot where PIL/torchvision plugs in; raises until
        the lib exists."""
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PIL is not available in this environment; use decoder='bmp' "
                "(real, pure-numpy) or 'fake'") from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from heracles_spark.operators.media_codecs import (decode_bmp24,
                                                           decode_netpbm,
                                                           decode_gif,
                                                           decode_png,
                                                           decode_qoi)
        for pdf in it:
            ids, nbytes, lumas, feats = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(b) if b is not None else b""
                ids.append(i)
                nbytes.append(len(raw))
                if decoder in ("bmp", "ppm", "qoi", "png", "gif"):
                    px = (decode_bmp24(raw) if decoder == "bmp"
                          else decode_netpbm(raw) if decoder == "ppm"
                          else decode_png(raw) if decoder == "png"
                          else decode_gif(raw) if decoder == "gif"
                          else decode_qoi(raw)[:, :, :3])
                    if px.ndim == 2:          # PGM grayscale
                        luma = px.astype("float64")
                    else:
                        luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                                + 0.114 * px[:, :, 2])
                    lumas.append(float(luma.mean()) / 255.0)
                    hist, _ = np.histogram(luma, bins=feature_dim,
                                           range=(0.0, 255.0 + 1e-9))
                    feats.append((hist / max(luma.size, 1))
                                 .astype("float32").tolist())
                else:
                    digest = hashlib.sha256(raw).digest()
                    lumas.append(digest[0] / 255.0)
                    feats.append([digest[j] / 255.0
                                  for j in range(feature_dim)])
            yield pd.DataFrame({"doc_id": ids, "n_bytes": nbytes,
                                "mean_luma": lumas, "feature": feats})

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        batches, schema=IMAGE_FEATURES)


def frame_sample_plan(df: DataFrame, id_col: str = "doc_id",
                      meta_col: str = "media",
                      every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into the frame
    timestamps to decode (the decode itself is the stubbed step). Pure
    built-ins: sequence + explode — the scalable fan-out shape."""
    dur = F.coalesce(F.col(f"{meta_col}.duration_ms"), F.lit(0))
    return (df.select(F.col(id_col),
                      F.explode(F.sequence(F.lit(0), dur, F.lit(every_ms)))
                       .alias("frame_ts_ms")))


AUDIO_FEATURES = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("mfcc_ish", T.ArrayType(T.FloatType()), True),
])

RESIZED_IMAGE = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("out_w", T.IntegerType(), False),
    T.StructField("out_h", T.IntegerType(), False),
    T.StructField("content", T.BinaryType(), True),
])


def decode_audio_features(df: DataFrame, id_col: str = "doc_id",
                          content_col: str = "content",
                          decoder: Literal["fake", "wav",
                                           "librosa"] = "fake",
                          n_coeffs: int = 13) -> DataFrame:
    """mapInPandas audio decode → per-clip features (RMS + MFCC-ish
    vector).

    Decoders:
      * "wav"  — REAL decode (operators.media_codecs, pure numpy;
        PCM-16 or G.711 μ-law format-7 blobs): int16 samples → rms of the [-1,1] signal; mfcc_ish = log
        energy of n_coeffs equal FFT magnitude bands (a deterministic
        spectral profile — the MFCC shape without the mel/DCT stages).
      * "fake" — hash-derived features (plumbing tests).
      * "librosa" — raises until the lib exists."""
    if decoder == "librosa":
        try:
            import librosa  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "librosa is not available in this environment; use "
                "decoder='wav' (real, pure-numpy) or 'fake'") from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from heracles_spark.operators.media_codecs import decode_wav_any
        for pdf in it:
            ids, nbytes, rms, coeffs = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(b) if b is not None else b""
                ids.append(i)
                nbytes.append(len(raw))
                if decoder == "wav":
                    samples, _rate, _ch = decode_wav_any(raw)
                    x = samples.mean(axis=1) / 32768.0   # downmix, [-1,1]
                    rms.append(float(np.sqrt(np.mean(x * x)))
                               if x.size else 0.0)
                    mag = np.abs(np.fft.rfft(x))
                    bands = np.array_split(mag, n_coeffs)
                    coeffs.append([
                        float(np.log1p(bd.sum())) for bd in bands])
                else:
                    digest = hashlib.sha256(b"audio" + raw).digest()
                    rms.append(digest[1] / 255.0)
                    coeffs.append([digest[j] / 255.0
                                   for j in range(n_coeffs)])
            yield pd.DataFrame({"doc_id": ids, "n_bytes": nbytes,
                                "rms": rms, "mfcc_ish": coeffs})

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        batches, schema=AUDIO_FEATURES)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "doc_id", content_col: str = "content",
                  decoder: Literal["fake", "bmp", "ppm", "pil"] = "fake") -> DataFrame:
    """mapInPandas image resize.

    Decoders:
      * "bmp"/"ppm" — REAL resize (operators.media_codecs): decode the
        24-bit BMP / binary PPM (P6), nearest-neighbor sample to
        out_w×out_h, re-encode in the same format.
      * "fake" — deterministic out_w×out_h byte payload derived from the
        source hash (single-channel thumbnail model) so batch shape,
        schema, and memory behavior match the real op.
      * "pil"  — raises until the lib exists."""
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PIL is not available in this environment; use "
                "decoder='bmp' (real, pure-numpy) or 'fake'") from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from heracles_spark.operators.media_codecs import (
            decode_bmp24, decode_netpbm, encode_bmp24, encode_ppm)
        for pdf in it:
            ids, ws, hs, outs = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(b) if b is not None else b""
                if decoder in ("bmp", "ppm"):
                    px = (decode_bmp24(raw) if decoder == "bmp"
                          else decode_netpbm(raw))
                    if px.ndim == 2:          # PGM -> RGB for re-encode
                        px = np.stack([px, px, px], axis=-1)
                    h, w = px.shape[:2]
                    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                    small = px[ys][:, xs]
                    buf = (encode_bmp24(small) if decoder == "bmp"
                           else encode_ppm(small))
                else:
                    seed = hashlib.sha256(raw).digest()
                    need = out_w * out_h
                    buf = (seed * (need // len(seed) + 1))[:need]
                ids.append(i); ws.append(out_w); hs.append(out_h)
                outs.append(buf)
            yield pd.DataFrame({"doc_id": ids, "out_w": ws, "out_h": hs,
                                "content": outs})

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        batches, schema=RESIZED_IMAGE)
