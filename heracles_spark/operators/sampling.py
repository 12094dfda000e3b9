"""Dataset splitting / sampling for training pipelines.

- ``hash_split``: deterministic, content-addressed train/eval split —
  the split is a pure function of the id/content (md5 bucket), so it is
  reproducible across runs, engines, partitionings, and re-shards. This
  is the correct way to split at 100 TB (seeded RNG sampling changes
  with partitioning; hashes don't).
- ``stratified_sample``: per-stratum sampling via ``sampleBy`` (seeded
  Bernoulli per row — deterministic for a fixed seed AND partitioning;
  documented as such).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets): md5 hex → first 8 hex digits →
    integer → mod. conv() is JVM-side; identical SQL exists for DuckDB
    oracles."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
             .cast("long") % n_buckets).cast("int")


def hash_split(df: DataFrame, on: str, train_pct: int = 80,
               out_col: str = "split") -> DataFrame:
    """Adds ``split`` = 'train' | 'eval' deterministically from the
    content of ``on``."""
    b = split_bucket(F.col(on))
    return df.withColumn(out_col,
                         F.when(b < train_pct, "train").otherwise("eval"))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. downsample dominant languages).
    Deterministic for fixed (seed, partitioning) — for partition-stable
    sampling use hash_split-style bucketing instead."""
    return df.sampleBy(strata_col, fractions, seed=seed)
