"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed via Arrow-batched
``mapInPandas`` — the Pandas-UDF slow path used only where built-ins
genuinely can't express the work (byte decoding).

The decode step is STUBBED (no image/audio libs in this container):
``decoder="fake"`` produces deterministic features from the bytes'
hash so the Spark-side plumbing — schema, batch iteration, partition
behavior — is real and tested; ``decoder="pil"``/"librosa" raise
NotImplementedError until the libs exist.

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
                          decoder: Literal["fake", "pil"] = "fake",
                          feature_dim: int = 8) -> DataFrame:
    """mapInPandas image decode → per-image features. The ``fake``
    decoder derives features from byte content deterministically; the
    real decoder slot shows where PIL/torchvision plugs in."""
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PIL is not available in this environment; use decoder='fake' "
                "to exercise the pipeline plumbing") from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            ids, nbytes, lumas, feats = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(b) if b is not None else b""
                digest = hashlib.sha256(raw).digest()
                ids.append(i)
                nbytes.append(len(raw))
                lumas.append(digest[0] / 255.0)
                feats.append([digest[j] / 255.0 for j in range(feature_dim)])
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
                          decoder: Literal["fake", "librosa"] = "fake",
                          n_coeffs: int = 13) -> DataFrame:
    """mapInPandas audio decode → per-clip features (RMS + MFCC-ish
    vector). Same contract as ``decode_image_features``: the ``fake``
    decoder derives deterministic features from a content hash so the
    Arrow batch plumbing is real; the librosa slot raises until the lib
    exists."""
    if decoder == "librosa":
        try:
            import librosa  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "librosa is not available in this environment; use "
                "decoder='fake' to exercise the pipeline plumbing") from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            ids, nbytes, rms, coeffs = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(b) if b is not None else b""
                digest = hashlib.sha256(b"audio" + raw).digest()
                ids.append(i)
                nbytes.append(len(raw))
                rms.append(digest[1] / 255.0)
                coeffs.append([digest[j] / 255.0 for j in range(n_coeffs)])
            yield pd.DataFrame({"doc_id": ids, "n_bytes": nbytes,
                                "rms": rms, "mfcc_ish": coeffs})

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        batches, schema=AUDIO_FEATURES)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "doc_id", content_col: str = "content",
                  decoder: Literal["fake", "pil"] = "fake") -> DataFrame:
    """mapInPandas image resize. The ``fake`` decoder emits a
    deterministic out_w×out_h byte payload derived from the source hash
    (length = out_w*out_h, modelling a single-channel thumbnail) so
    batch shape, schema, and memory behavior match the real op; PIL
    plugs into the same slot."""
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "PIL is not available in this environment; use "
                "decoder='fake' to exercise the pipeline plumbing") from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            ids, ws, hs, outs = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(b) if b is not None else b""
                seed = hashlib.sha256(raw).digest()
                need = out_w * out_h
                buf = (seed * (need // len(seed) + 1))[:need]
                ids.append(i); ws.append(out_w); hs.append(out_h)
                outs.append(buf)
            yield pd.DataFrame({"doc_id": ids, "out_w": ws, "out_h": hs,
                                "content": outs})

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        batches, schema=RESIZED_IMAGE)
