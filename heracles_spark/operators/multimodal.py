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
