"""Streaming near-duplicate detection at ingest — "dedup at the door".

A 100 TB corpus is assembled incrementally; re-running batch MinHash
over the full corpus per delivery is O(corpus) each time. This module
keeps a persistent LSH BUCKET STORE (band_hash → doc ids, parquet,
partitioned by band) and, per micro-batch via foreachBatch:

1. computes MinHash signatures for the batch only
   (operators.dedup.minhash_signatures — map-side, O(batch));
2. derives the batch's (band, band_hash, id) bucket entries;
3. equi-joins them against the store to flag arrivals colliding with
   ANY previously ingested document (candidate near-dups, the same
   banding guarantee as the batch operator);
4. appends the batch's entries to the store (idempotent per batch id:
   a replayed batch overwrites its own subdirectory, never duplicates).

Store size is O(docs × bands) longs; the probe join touches only the
band partitions the batch hashes into. Flagged ids land in a second
append-only parquet log for downstream quarantine/verify.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heracles_spark.operators import dedup


def _band_entries(batch: DataFrame, id_col: str, text_col: str,
                  bands: int, rows_per_band: int) -> DataFrame:
    sigs = dedup.minhash_signatures(batch, id_col, text_col,
                                    k=bands * rows_per_band)
    slices = ", ".join(
        f"named_struct('band', {b}, 'band_hash', "
        f"xxhash64(concat_ws(',', slice(sig, {b * rows_per_band + 1}, "
        f"{rows_per_band}))))"
        for b in range(bands))
    return (sigs.select(F.col(id_col),
                        F.explode(F.expr(f"array({slices})")).alias("e"))
                .select(id_col, F.col("e.band").alias("band"),
                        F.col("e.band_hash").alias("band_hash")))


def flag_near_dups_batch(spark: SparkSession, batch: DataFrame,
                         store_dir: str, batch_id: int,
                         id_col: str = "doc_id", text_col: str = "text",
                         bands: int = 8, rows_per_band: int = 4) -> DataFrame:
    """One micro-batch step (callable directly or from foreachBatch).
    Returns the flagged rows (id, n_bucket_hits) for this batch —
    arrivals sharing ≥ 1 LSH bucket with any PRIOR document."""
    entries = _band_entries(batch, id_col, text_col, bands, rows_per_band)

    store_path = os.path.join(store_dir, "buckets")
    if os.path.isdir(store_path):
        # batch != batch_id: a REPLAYED batch must not probe the
        # entries its failed attempt already wrote (self-flagging).
        prior = (spark.read.parquet(store_path)
                      .where(F.col("batch") != batch_id))
        flagged = (entries.join(prior.select("band", "band_hash"),
                                ["band", "band_hash"])
                          .groupBy(id_col)
                          .agg(F.count(F.lit(1)).alias("n_bucket_hits")))
    else:
        flagged = (entries.limit(0)
                          .groupBy(id_col)
                          .agg(F.count(F.lit(1)).alias("n_bucket_hits")))
    # Materialize BEFORE the store append so the probe can never see
    # this batch's own entries.
    flagged = flagged.localCheckpoint()

    # Idempotent append: each batch owns batch=<id>/; a replay
    # overwrites its own partition only.
    # The batch value comes from the partition DIRECTORY at read time
    # (hive-style discovery); keeping it out of the files avoids the
    # data/partition column clash.
    # Explicit parquet: the probe reads spark.read.parquet(store_path),
    # so the store must not follow spark.sql.sources.default.
    (entries.write.mode("overwrite").format("parquet")
            .save(os.path.join(store_path, f"batch={batch_id}")))
    (flagged.write.mode("overwrite").format("parquet")
            .save(os.path.join(store_dir, "flags", f"batch={batch_id}")))
    return flagged


def stream_flag_near_dups(spark: SparkSession, source_dir: str,
                          schema, store_dir: str,
                          checkpoint_dir: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          bands: int = 8, rows_per_band: int = 4,
                          max_files_per_trigger: int | None = None,
                          available_now: bool = True):
    """Wire flag_near_dups_batch into a file-source stream via
    foreachBatch. Exactly the arrival pipeline: each delivery is
    probed against everything before it, then becomes part of the
    store for everything after it."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    sdf = reader.parquet(source_dir)

    def _step(batch: DataFrame, batch_id: int) -> None:
        flag_near_dups_batch(spark, batch, store_dir, batch_id,
                             id_col, text_col, bands, rows_per_band)

    ws = (sdf.writeStream.foreachBatch(_step)
             .option("checkpointLocation", checkpoint_dir))
    if available_now:
        ws = ws.trigger(availableNow=True)
    return ws.start()
