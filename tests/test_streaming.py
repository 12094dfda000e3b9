"""Structured Streaming ingest + windowed aggregation (availableNow
micro-batch over a file source — bounded, deterministic)."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from heracles_spark.streaming import ingest


def test_stream_into_key_table(spark, catalog, tmp_path):
    catalog.create_table("ev", [("k", "int"), ("v", "string")], ["k"])
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string") \
         .coalesce(1).write.parquet(str(src / "batch1"))
    q = ingest.stream_into_table(
        spark, catalog, "ev", str(src / "batch1"),
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    rows = sorted((r["k"], r["v"])
                  for r in catalog.read_table(spark, "ev").collect())
    assert rows == [(1, "a"), (2, "b")]
    assert catalog.get_table("ev").files  # file index refreshed


def test_windowed_counts_batch_parity(spark):
    rows = [("2024-01-01 00:10:00", "click", 1.0),
            ("2024-01-01 00:40:00", "click", 2.0),
            ("2024-01-01 01:10:00", "view", 3.0),
            ("2024-01-01 01:20:00", "click", 4.0)]
    df = (spark.createDataFrame(rows, "ts_s string, event_type string, value double")
          .withColumn("ts", F.col("ts_s").cast("timestamp")))
    got = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
           for r in ingest.windowed_event_counts(df).collect()}
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 3.0)
    assert got[("2024-01-01 01:00:00", "click")] == (1, 4.0)


def test_session_windows(spark):
    rows = [("2024-01-01 00:00:00", 1), ("2024-01-01 00:10:00", 1),
            ("2024-01-01 02:00:00", 1), ("2024-01-01 00:05:00", 2)]
    df = (spark.createDataFrame(rows, "ts_s string, user_id int")
          .withColumn("ts", F.col("ts_s").cast("timestamp")))
    got = sorted((r["user_id"], r["n_events"])
                 for r in ingest.sessionized_counts(df).collect())
    assert got == [(1, 1), (1, 2), (2, 1)]   # user 1: 2 sessions


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState: per-user state carried across micro-batches
    (two input files, maxFilesPerTrigger=1 ⇒ two batches)."""
    from heracles_spark.streaming.stateful import running_user_stats

    src = tmp_path / "events_src"
    src.mkdir()
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)],
                          "user_id long, value double") \
         .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame([(1, 2.0), (3, 7.0)],
                          "user_id long, value double") \
         .coalesce(1).write.parquet(str(src / "f2"))

    stream = (spark.readStream
              .schema("user_id long, value double")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*")))
    out = running_user_stats(stream)
    q = (out.writeStream.format("memory").queryName("running_stats")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM running_stats").collect()
    # last emitted update per user carries the running total
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (3, 17.0)      # 2 events batch1 + 1 batch2, totals merged
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)


def test_streaming_exact_dedup(spark, tmp_path):
    from pyspark.sql import functions as F

    from heracles_spark.streaming.stateful import streaming_exact_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    rows = [("2024-01-01 00:00:00", 1, "a"), ("2024-01-01 00:05:00", 1, "a"),
            ("2024-01-01 00:10:00", 2, "b")]
    (spark.createDataFrame(rows, "ts_s string, k long, v string")
          .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
          .coalesce(1).write.parquet(str(src / "f1")))
    stream = (spark.readStream.schema("k long, v string, ts timestamp")
              .parquet(str(src / "*")))
    out = streaming_exact_dedup(stream, ["k"])
    q = (out.writeStream.format("memory").queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted((r["k"], r["v"])
                 for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert got == [(1, "a"), (2, "b")]
