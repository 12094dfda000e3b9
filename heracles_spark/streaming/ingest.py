"""Streaming ingest + windowed aggregation.

Design:
- ``stream_into_table``: readStream (file source) → foreachBatch →
  writer.write_key_organized. foreachBatch is the idiomatic bridge for
  sinks with their own layout logic (key-range repartition + sort);
  each micro-batch pays one range shuffle, identical to the batch path.
- ``windowed_event_counts``: watermark + tumbling window — the standard
  late-data-tolerant aggregation; state is bounded by the watermark.
- ``sessionized_counts``: session windows via F.session_window — gap-
  based sessions with watermarked state cleanup, the streaming twin of
  queries.relational.events_sessionize.

Scale: file-source streams parallelize by file listing; maxFilesPerTrigger
bounds per-batch work. State-store size is governed by watermark delay ×
key cardinality — both knobs surfaced as arguments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_into_table(spark: SparkSession, catalog, table: str,
                      source_dir: str, schema=None,
                      fmt: str = "parquet",
                      checkpoint_dir: str | None = None,
                      max_files_per_trigger: int = 16,
                      available_now: bool = False,
                      exactly_once: bool = True,
                      refresh_rollups: list[str] | None = None,
                      refresh_indexes: list[str] | None = None,
                      refresh_text_indexes: list[str] | None = None,
                      refresh_vector_indexes: list[str] | None = None,
                      refresh_stats: bool = False
                      ) -> StreamingQuery:
    """Continuously ingest files from ``source_dir`` into a key-organized
    table, preserving the key-range layout per micro-batch.

    ``exactly_once=True`` (default) routes each batch through
    ``writer.append_batch_exactly_once`` — a marker-first per-batch
    commit log that makes at-least-once foreachBatch replays converge
    instead of duplicate rows (see that function's docstring for the
    crash matrix).

    ``refresh_rollups`` names rollup tables (heracles_spark.rollup) to
    refresh after each batch commits — continuous aggregates that stay
    within one micro-batch of the stream. The refresh is itself
    idempotent under replay: a replayed batch appends no new files (the
    commit log no-ops), so the rollup's file diff is empty and the
    refresh no-ops too."""
    from heracles_spark import writer

    tbl = catalog.get_table(table)
    reader = (spark.readStream
              .format(fmt)
              .schema(schema or tbl.schema())
              .option("maxFilesPerTrigger", str(max_files_per_trigger)))
    stream = reader.load(source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if exactly_once:
            writer.append_batch_exactly_once(spark, catalog, table,
                                             batch_df, batch_id)
        else:
            writer.write_key_organized(spark, catalog, table, batch_df,
                                       mode="append")
        if refresh_rollups:
            from heracles_spark.rollup import refresh_rollup
            for r in refresh_rollups:
                refresh_rollup(spark, catalog, r)
        if refresh_indexes:
            from heracles_spark.index import refresh_index
            for i in refresh_indexes:
                refresh_index(spark, catalog, table, i)
        if refresh_text_indexes:
            # Streaming batches are pure appends with fresh keys, so
            # this takes textindex's INCREMENTAL path (only the batch's
            # files re-explode); a replayed batch appends nothing and
            # the refresh no-ops — idempotent like the rollup refresh.
            from heracles_spark.textindex import refresh_text_index
            for i in refresh_text_indexes:
                refresh_text_index(spark, catalog, table, i)
        if refresh_vector_indexes:
            # Same shape as the text-index maintenance: pure-append
            # batches with fresh keys take vectorindex's INCREMENTAL
            # path — only the batch's vectors are assigned to the
            # EXISTING centroids (faiss add-without-retrain) and
            # appended to the cell-partitioned store; a replayed batch
            # appends no files, so the refresh no-ops. Continuous ANN
            # maintenance at ingest: the index stays within one
            # micro-batch of the stream.
            from heracles_spark.vectorindex import refresh_vector_index
            for i in refresh_vector_indexes:
                refresh_vector_index(spark, catalog, table, i)
        if refresh_stats:
            # Catalog statistics stay within one micro-batch of the
            # stream: the pure-append batch takes refresh_statistics'
            # INCREMENTAL path (counts add, NDV sketches union,
            # histograms recompute column-pruned); a replayed batch
            # appends no files, so the refresh no-ops — idempotent
            # like the rollup/index maintenance above. Tables never
            # ANALYZEd are skipped (nothing to maintain yet).
            if catalog.get_table(table).properties.get("stats"):
                writer.refresh_statistics(spark, catalog, table)

    w = (stream.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation",
                 checkpoint_dir or f"{tbl.data_dir}/_checkpoint"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_upsert_into_table(spark: SparkSession, catalog, table: str,
                             source_dir: str, schema=None,
                             fmt: str = "parquet",
                             order_col: str | None = None,
                             checkpoint_dir: str | None = None,
                             max_files_per_trigger: int = 16,
                             available_now: bool = False) -> StreamingQuery:
    """Streaming upsert: readStream → foreachBatch → MERGE INTO on the
    table's key columns (WHEN MATCHED UPDATE SET *, WHEN NOT MATCHED
    INSERT *) — the streaming CDC-apply pattern.

    Each micro-batch is first collapsed to ONE row per key: the row with
    the greatest ``order_col`` (event time / sequence number) wins; with
    no ``order_col``, the greatest tuple of non-key columns — an
    arbitrary but DETERMINISTIC winner, so a replayed batch picks the
    same row. That per-key uniqueness is what MERGE requires (ambiguous
    multi-matches raise).

    Delivery: foreachBatch is at-least-once, but key-upsert is
    idempotent — replaying a batch converges to the same table state —
    so the sink is effectively exactly-once (the standard foreachBatch +
    idempotent-merge contract; checkpoint tracks source progress).

    Scale: per batch, one broadcastable join against the target plus the
    rewrite. The ON condition is a pure key-equality conjunction, so the
    batch MERGE's file-level copy-on-write pruning applies automatically:
    each micro-batch rewrites only the files its key range touches, not
    the table — the 100 TB CDC-apply path."""
    from pyspark.sql.window import Window

    from heracles_spark.merge import MergeClause, merge_into

    tbl = catalog.get_table(table)
    keys = tbl.key_cols
    reader = (spark.readStream
              .format(fmt)
              .schema(schema or tbl.schema())
              .option("maxFilesPerTrigger", str(max_files_per_trigger)))
    stream = reader.load(source_dir)

    on = " AND ".join(f"target.{k} = source.{k}" for k in keys)
    clauses = [MergeClause("matched", "update", assignments={"*": "*"}),
               MergeClause("not_matched", "insert", assignments={"*": "*"})]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        order = ([F.col(order_col).desc()] if order_col else
                 [F.col(c).desc() for c in batch_df.columns
                  if c not in keys] or [F.lit(1).asc()])
        w = Window.partitionBy(*keys).orderBy(*order)
        latest = (batch_df.withColumn("__rn__", F.row_number().over(w))
                          .where(F.col("__rn__") == 1).drop("__rn__"))
        merge_into(spark, catalog, table, latest, on, clauses,
                   check_ambiguity=False)   # per-key uniqueness just enforced

    w = (stream.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation",
                 checkpoint_dir or f"{tbl.data_dir}/_upsert_checkpoint"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          value_col: str | None = "value",
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts — works on both streaming and
    batch DataFrames (same plan, different sink semantics).

    ``value_col`` names the column summed per window; pass ``None`` (or
    a name absent from the frame) to aggregate counts only instead of
    failing analysis on inputs without a value column."""
    if value_col is not None and value_col not in events.columns:
        value_col = None
    aggs = [F.count(F.lit(1)).alias("n_events")]
    out = ["n_events"]
    if value_col:
        aggs.append(F.sum(value_col).alias("total_value"))
        out.append("total_value")
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     F.col(key_col))
            .agg(*aggs)
            .select(F.col("win.start").alias("window_start"),
                    key_col, *out))


def sessionized_counts(events: DataFrame, ts_col: str = "ts",
                       user_col: str = "user_id",
                       gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Session windows (gap-close semantics) with watermark-bounded state."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                     F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    user_col, "n_events"))


def stream_stream_interval_join(clicks: DataFrame, purchases: DataFrame,
                                key_col: str = "user_id",
                                ts_col: str = "ts",
                                within: str = "30 minutes",
                                watermark: str = "1 hour") -> DataFrame:
    """Stream-stream inner join with an event-time interval bound:
    purchase P joins click C of the same key when
    C.ts ∈ [P.ts - within, P.ts]. The standard attribution shape
    (click-through conversion).

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, so Spark can size the state store and expire
    buffered rows — an unbounded stream-stream join would otherwise keep
    every row forever. State per key ≈ rows inside the watermark+interval
    horizon only.

    Works identically on batch frames (same plan, no state)."""
    c = (clicks.withWatermark(ts_col, watermark)
               .select(F.col(key_col).alias("k"),
                       F.col(ts_col).alias("click_ts")))
    p = (purchases.withWatermark(ts_col, watermark)
                  .select(F.col(key_col).alias(key_col),
                          F.col(ts_col).alias("purchase_ts"),
                          *[col for col in purchases.columns
                            if col not in (key_col, ts_col)]))
    cond = ((p[key_col] == c["k"])
            & (c["click_ts"] <= p["purchase_ts"])
            & (c["click_ts"] >= p["purchase_ts"]
               - F.expr(f"INTERVAL {within}")))
    return (p.join(c, cond, "inner")
             .drop("k"))


def streaming_dedup_within_watermark(events: DataFrame,
                                     id_cols: list[str] | None = None,
                                     ts_col: str = "ts",
                                     watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-id within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keeps state only until the
    watermark passes each id's first-seen time — the bounded-state
    answer to at-least-once sources re-delivering events (the unbounded
    ``dropDuplicates`` state grows forever on a 100 TB/day stream).
    """
    ids = id_cols or ["event_id"]
    return (events.withWatermark(ts_col, watermark)
                  .dropDuplicatesWithinWatermark(ids))


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open events.parquet as a FILE-SOURCE STREAM normalized to
    (ts_evt TIMESTAMP, event_id, user_id, event_type, value) — the
    streaming twin of queries.relational._events.

    - The file stream source requires a DIRECTORY: the single source
      file is exposed through a symlink in a per-(path) temp dir (no
      copy; idempotent per session).
    - Watermarks require TimestampType, so the naive NTZ wall time is
      mapped to an instant as epoch-micros-assuming-UTC via FIELD
      EXTRACTION (tz-free; timestampdiff would shift around DST in a
      non-UTC session — see relational._events) and timestamp_micros.
      The same naive-as-UTC reading is what DuckDB's epoch_us()
      oracle-side uses, so downstream epoch outputs compare exactly.
    - Handles both physical layouts the driver has shipped
      (TIMESTAMP(NANOS) read as long under nanosAsLong;
      TIMESTAMP(MICROS) read as TIMESTAMP_NTZ)."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    # md5 of the abspath, NOT Python hash(): str hash is salted per
    # process (PYTHONHASHSEED), which would mint a fresh dir every run
    # and leak stale symlink dirs under /tmp.
    key = hashlib.md5(os.path.abspath(src).encode()).hexdigest()
    link_dir = os.path.join(tempfile.gettempdir(), "heracles_stream_src",
                            key)
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, "events.parquet")
    if os.path.islink(link) and os.readlink(link) != os.path.abspath(src):
        os.remove(link)   # same key, different target: re-link
    if not os.path.islink(link):
        os.symlink(os.path.abspath(src), link)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema
    sdf = spark.readStream.schema(schema).parquet(link_dir)
    ts_type = dict(sdf.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        us = F.expr("ts div 1000")
    else:
        us = F.expr(
            "unix_date(cast(cast(ts as timestamp_ntz) as date))"
            " * 86400000000"
            " + cast(hour(cast(ts as timestamp_ntz)) as bigint)"
            " * 3600000000"
            " + cast(minute(cast(ts as timestamp_ntz)) as bigint)"
            " * 60000000"
            " + cast(extract(SECOND from cast(ts as timestamp_ntz))"
            "        * 1000000 as bigint)")
    return sdf.select(
        F.timestamp_micros(us).alias("ts_evt"),
        "event_id", "user_id", "event_type", "value")


def run_to_completion(out: DataFrame, name: str,
                      mode: str = "complete",
                      timeout_s: int = 300) -> "DataFrame":
    """Execute a finite stream (availableNow) into a memory sink and
    return the materialized result table. The driver-facing bridge
    that lets streaming operators be ORACLE-CHECKED like any batch
    query: same plan, bounded input, complete-mode emission (append
    mode would hold back windows newer than the final watermark)."""
    spark = out.sparkSession
    q = (out.writeStream.format("memory").queryName(name)
            .outputMode(mode).trigger(availableNow=True).start())
    try:
        # processAllAvailable returns once every available row is
        # processed — unlike awaitTermination, it does not wait out
        # operators that keep the query alive for future triggers
        # (e.g. applyInPandasWithState holding processing-time
        # timeouts).
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(timeout_s)
    return spark.table(name)
