"""Extension-operator corpus: as-of join, binned range join, UDF-in-WHERE
— capabilities beyond the reference surface (SURVEY §2.3 notes the
reference has no range/as-of joins; §2.10 for the UDF surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.operators import temporal
from heracles_spark.queries.relational import _events, _t


def events_asof_join(spark, sf_dir):
    """Backward as-of join: each purchase picks up the latest preceding
    click of the same user (operators.temporal.asof_join — one shuffle,
    union-and-carry). Aggregated per user for a stable result."""
    e = _events(spark, sf_dir)
    purchases = (e.where(F.col("event_type") == "purchase")
                  .select("user_id", "ts_ns", "event_id"))
    clicks = (e.where(F.col("event_type") == "click")
               .select("user_id", "ts_ns",
                       F.col("ts_ns").alias("click_ts_ns")))
    j = temporal.asof_join(purchases, clicks, on="ts_ns", by="user_id",
                           right_cols=["click_ts_ns"])
    gap_s = F.expr("(ts_ns - click_ts_ns_right) div 1000000000")
    return (j.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_purchases"),
                  F.sum(F.when(F.col("click_ts_ns_right").isNotNull(), 1)
                         .otherwise(0)).alias("n_with_click"),
                  F.sum(F.coalesce(gap_s, F.lit(0))).alias("total_gap_s"))
             .where(F.col("user_id") <= 300)
             .orderBy("user_id"))


ASOF_SQL = """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.user_id,
       COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_click,
       CAST(SUM(CASE WHEN c.ts IS NOT NULL
                     THEN (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000000
                     ELSE 0 END) AS BIGINT) AS total_gap_s
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
GROUP BY 1 HAVING p.user_id <= 300 ORDER BY 1
"""


def events_range_join(spark, sf_dir):
    """Interval join via bin-bucketing: (purchase, click) pairs where the
    click falls in the 10 minutes before the purchase
    (operators.temporal.range_join_binned — hash join on (user, bin),
    never a nested loop)."""
    e = _events(spark, sf_dir)
    sec = F.expr("ts_ns div 1000000000")
    purchases = (e.where(F.col("event_type") == "purchase")
                  .select("user_id", sec.alias("p_s")))
    clicks = (e.where(F.col("event_type") == "click")
               .select("user_id", sec.alias("c_s")))
    j = temporal.range_join_binned(purchases, clicks, by="user_id",
                                   left_ts="p_s", right_ts="c_s",
                                   lower=-600, upper=0, bin_width=300)
    return (j.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_pairs"))
             .where(F.col("user_id") <= 300)
             .orderBy("user_id"))


RANGE_SQL = """
WITH p AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS p_s FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS c_s FROM events
           WHERE event_type = 'click')
SELECT p.user_id, COUNT(*) AS n_pairs
FROM p JOIN c ON p.user_id = c.user_id
              AND c.c_s >= p.p_s - 600 AND c.c_s < p.p_s
GROUP BY 1 HAVING p.user_id <= 300 ORDER BY 1
"""


def udf_where_filter(spark, sf_dir):
    """Pandas-UDF predicate in WHERE (≙ udf-in-WHERE,
    HBaseAdditionalQuerySuite.scala:204-238). The oracle states the same
    predicate in plain SQL — proving the UDF computes what it claims."""
    from heracles_spark.functions import register_builtin_udfs

    register_builtin_udfs(spark)
    c = _t(spark, sf_dir, "customer")
    return (c.where(F.expr("age_filter_v(c_acctbal)"))
             .groupBy("c_nationkey")
             .agg(F.count(F.lit(1)).alias("n_rich"))
             .orderBy("c_nationkey"))


UDF_SQL = """
SELECT c_nationkey, COUNT(*) AS n_rich
FROM customer WHERE c_acctbal > 20
GROUP BY 1 ORDER BY c_nationkey
"""


QUERIES = {
    "events_asof_join": (events_asof_join, ASOF_SQL),
    "events_range_join": (events_range_join, RANGE_SQL),
    "udf_where_filter": (udf_where_filter, UDF_SQL),
}


def events_asof_forward(spark, sf_dir):
    """FORWARD as-of join (direction='forward'): each purchase picks up
    the EARLIEST following click of the same user — "what did the buyer
    do next". DuckDB has no forward ASOF; the oracle states the
    semantics with a window-min over the time-ordered union, proving the
    direction logic value-exact."""
    e = _events(spark, sf_dir)
    purchases = (e.where(F.col("event_type") == "purchase")
                  .select("user_id", "ts_ns", "event_id"))
    clicks = (e.where(F.col("event_type") == "click")
               .select("user_id", "ts_ns",
                       F.col("ts_ns").alias("click_ts_ns")))
    j = temporal.asof_join(purchases, clicks, on="ts_ns", by="user_id",
                           right_cols=["click_ts_ns"],
                           direction="forward")
    gap_s = F.expr("(click_ts_ns_right - ts_ns) div 1000000000")
    return (j.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_purchases"),
                  F.sum(F.when(F.col("click_ts_ns_right").isNotNull(), 1)
                         .otherwise(0)).alias("n_with_next_click"),
                  F.sum(F.coalesce(gap_s, F.lit(0)))
                   .cast("bigint").alias("total_gap_s"))
             .where(F.col("user_id") <= 300)
             .orderBy("user_id"))


ASOF_FWD_SQL = """
WITH u AS (
  SELECT user_id, epoch_ns(ts) AS t, 0 AS side, epoch_ns(ts) AS ron
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, epoch_ns(ts) AS t, 1 AS side, NULL AS ron
  FROM events WHERE event_type = 'purchase'),
 carried AS (
  SELECT user_id, t, side,
         MIN(ron) OVER (PARTITION BY user_id ORDER BY t DESC, side ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS next_click
  FROM u)
SELECT user_id, COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN next_click IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_next_click,
       CAST(SUM(CASE WHEN next_click IS NOT NULL
                     THEN (next_click - t) // 1000000000 ELSE 0 END)
            AS BIGINT) AS total_gap_s
FROM carried WHERE side = 1
GROUP BY user_id HAVING user_id <= 300 ORDER BY user_id
"""


QUERIES["events_asof_forward"] = (events_asof_forward, ASOF_FWD_SQL)


# -- streaming queries, driver-checkable ------------------------------------
# Finite availableNow streams through the REAL Structured Streaming
# operators (watermark + window / session_window), materialized via a
# memory sink and compared against batch SQL oracles — converting the
# streaming subsystem from pytest-only to value-oracle-checked.

_STREAM_SEQ = [0]


def _sink_name(base: str) -> str:
    _STREAM_SEQ[0] += 1
    return f"{base}_{_STREAM_SEQ[0]}"


def stream_hourly_agg(spark, sf_dir):
    """Watermarked tumbling-hour streaming aggregation run to
    completion (streaming.ingest.windowed_event_counts over an
    availableNow file stream, complete-mode memory sink). Epoch-micros
    window starts and decimal-exact value sums make the result
    bit-comparable to the batch GROUP BY oracle."""
    from heracles_spark.streaming import ingest

    evt = ingest.stream_events(spark, sf_dir)
    evt = evt.withColumn("value", F.col("value").cast("decimal(38,6)"))
    out = ingest.windowed_event_counts(evt, ts_col="ts_evt",
                                       key_col="event_type",
                                       value_col="value")
    out = out.select(
        F.unix_micros(F.col("window_start")).alias("hour_epoch_us"),
        "event_type", "n_events",
        F.col("total_value").cast("double").alias("total_value"))
    res = ingest.run_to_completion(out, _sink_name("stream_hourly"))
    return res.orderBy("hour_epoch_us", "event_type")


STREAM_HOURLY_SQL = """
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch_us,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES["stream_hourly_agg"] = (stream_hourly_agg, STREAM_HOURLY_SQL)


def stream_sessionize(spark, sf_dir):
    """Streaming SESSION WINDOWS (gap-close semantics, watermarked
    state) run to completion — the stateful streaming twin of
    events_sessionize. Session bounds come out as epoch micros; the
    oracle reproduces Spark's session rule (an event at exactly
    last_ts + gap starts a NEW session) with gaps-and-islands SQL."""
    from heracles_spark.streaming import ingest

    evt = (ingest.stream_events(spark, sf_dir)
           .where(F.col("user_id") <= 100))
    out = ingest.sessionized_counts(evt, ts_col="ts_evt",
                                    user_col="user_id",
                                    gap="30 minutes")
    out = out.select(
        F.unix_micros(F.col("session_start")).alias("session_start_us"),
        F.unix_micros(F.col("session_end")).alias("session_end_us"),
        "user_id", "n_events")
    res = ingest.run_to_completion(out, _sink_name("stream_sessions"))
    return res.orderBy("user_id", "session_start_us")


STREAM_SESS_SQL = """
WITH e AS (SELECT user_id, ts FROM events WHERE user_id <= 100),
 m AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
 s AS (SELECT user_id, ts,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
       FROM m)
SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
       CAST(epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS BIGINT)
         AS session_end_us,
       user_id, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us
"""


QUERIES["stream_sessionize"] = (stream_sessionize, STREAM_SESS_SQL)


def stream_click_attribution(spark, sf_dir):
    """Stream-stream event-time INTERVAL JOIN run to completion: each
    purchase joins the same user's clicks in the preceding 30 minutes
    (streaming.ingest.stream_stream_interval_join — two watermarked
    file streams, two-sided time bound so the state store expires).
    Output: the attribution pairs as epoch micros."""
    from heracles_spark.streaming import ingest

    evt = ingest.stream_events(spark, sf_dir)
    clicks = (evt.where((F.col("event_type") == "click")
                        & (F.col("user_id") <= 100))
                 .select("user_id", F.col("ts_evt").alias("ts")))
    evt2 = ingest.stream_events(spark, sf_dir)
    purchases = (evt2.where((F.col("event_type") == "purchase")
                            & (F.col("user_id") <= 100))
                     .select("user_id", F.col("ts_evt").alias("ts")))
    j = ingest.stream_stream_interval_join(clicks, purchases,
                                           key_col="user_id",
                                           ts_col="ts", within="30 minutes")
    out = j.select("user_id",
                   F.unix_micros(F.col("purchase_ts")).alias("purchase_us"),
                   F.unix_micros(F.col("click_ts")).alias("click_us"))
    res = ingest.run_to_completion(out, _sink_name("stream_attr"),
                                   mode="append")
    return res.orderBy("user_id", "purchase_us", "click_us")


STREAM_ATTR_SQL = """
SELECT p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
       CAST(epoch_us(c.ts) AS BIGINT) AS click_us
FROM (SELECT user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id <= 100) p
JOIN (SELECT user_id, ts FROM events
      WHERE event_type = 'click' AND user_id <= 100) c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
ORDER BY p.user_id, purchase_us, click_us
"""


QUERIES["stream_click_attribution"] = (stream_click_attribution,
                                       STREAM_ATTR_SQL)


def stream_user_stats(spark, sf_dir):
    """Custom stateful streaming operator driver-checked: per-user
    running (count, total) via applyInPandasWithState
    (streaming.stateful.running_user_stats). Values are pre-scaled to
    integral doubles (round(value·10⁶)) so the Python-side float
    accumulation is EXACT in any order below 2^53 — the final state
    equals the batch aggregate bit-for-bit after one division."""
    from heracles_spark.streaming import ingest, stateful
    from pyspark.sql import Window

    evt = (ingest.stream_events(spark, sf_dir)
           .where(F.col("user_id") <= 300)
           .select("user_id", F.round(F.col("value") * 1e6).alias("value")))
    out = stateful.running_user_stats(evt, timeout=None)
    res = ingest.run_to_completion(out, _sink_name("stream_ustats"),
                                   mode="update")
    # update mode emits one row per (key, micro-batch); the FINAL row
    # per key (max n_events — counts are monotone) is the answer.
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (res.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1)
               .select("user_id", "n_events",
                       (F.col("total_value") / 1e6).alias("total_value"))
               .orderBy("user_id"))


STREAM_USTATS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE)
         / 1000000 AS total_value
FROM events WHERE user_id <= 300
GROUP BY user_id ORDER BY user_id
"""


QUERIES["stream_user_stats"] = (stream_user_stats, STREAM_USTATS_SQL)


def events_session_overlap(spark, sf_dir):
    """Interval×interval join: per-user click-session intervals overlap-
    joined with view-session intervals (operators.temporal.
    interval_overlap_join — bin-bucketed equi-rewrite + first-shared-bin
    dedup guard, no nested loop). Sessions = 30-min-gap islands, the
    events_sessionize convention; intervals are [first_event,
    last_event + 1ns) half-open."""
    from pyspark.sql import Window

    from heracles_spark.operators.temporal import interval_overlap_join
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir).where(F.col("user_id") <= 200)
    gap = 1800 * 1_000_000_000

    def sessions(etype, tag):
        s = e.where(F.col("event_type") == etype).select("user_id", "ts_ns")
        w = Window.partitionBy("user_id").orderBy("ts_ns")
        brk = F.when(F.lag("ts_ns").over(w).isNull()
                     | (F.col("ts_ns") - F.lag("ts_ns").over(w) > gap),
                     1).otherwise(0)
        return (s.withColumn("__b", brk)
                 .withColumn("__sid", F.sum("__b").over(
                     w.rowsBetween(Window.unboundedPreceding, 0)))
                 .groupBy("user_id", "__sid")
                 .agg(F.min("ts_ns").alias(f"{tag}_start"),
                      (F.max("ts_ns") + gap).alias(f"{tag}_end"))
                 .drop("__sid"))

    j = interval_overlap_join(
        sessions("click", "c"), sessions("view", "v"), "user_id",
        "c_start", "c_end", "v_start", "v_end",
        bin_width=3600 * 1_000_000_000)
    return (j.select("user_id", "c_start", "c_end", "v_start", "v_end")
             .orderBy("user_id", "c_start", "v_start"))


SESS_OVERLAP_SQL = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) * 1000 AS ts_ns
  FROM events WHERE user_id <= 200
    AND event_type IN ('click', 'view')),
 m AS (
  SELECT user_id, event_type, ts_ns,
         CASE WHEN lag(ts_ns) OVER w IS NULL
                   OR ts_ns - lag(ts_ns) OVER w > 1800000000000
              THEN 1 ELSE 0 END AS brk
  FROM base WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_ns)),
 s AS (SELECT user_id, event_type, ts_ns,
              SUM(brk) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts_ns) AS sid
       FROM m),
 iv AS (SELECT user_id, event_type,
               MIN(ts_ns) AS s_start,
               MAX(ts_ns) + 1800000000000 AS s_end
        FROM s GROUP BY user_id, event_type, sid)
SELECT c.user_id,
       c.s_start AS c_start, c.s_end AS c_end,
       v.s_start AS v_start, v.s_end AS v_end
FROM (SELECT * FROM iv WHERE event_type = 'click') c
JOIN (SELECT * FROM iv WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND c.s_start < v.s_end AND v.s_start < c.s_end
ORDER BY c.user_id, c_start, v_start
"""


QUERIES["events_session_overlap"] = (events_session_overlap,
                                     SESS_OVERLAP_SQL)


def stream_near_dup_ingest(spark, sf_dir):
    """Dedup-at-the-door contract: even-id docs are ingested as batch 0
    (building the persistent LSH bucket store), then batch 1 arrives
    carrying 30 VERBATIM copies of batch-0 docs (ids shifted +100000)
    plus the odd-id docs (streaming.dedup_ingest.flag_near_dups_batch).
    Identical text ⇒ identical MinHash signatures ⇒ identical band
    hashes, so every planted copy MUST be flagged — recall 1
    deterministically; the oracle pins n_planted and
    planted_all_flagged=TRUE. (Additional near-dup flags among the
    organic odd-id docs are sketch-specific and deliberately not part
    of the contract.)"""
    import tempfile

    from heracles_spark.streaming.dedup_ingest import flag_near_dups_batch
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir).select("doc_id", "text")
    first = d.where(F.col("doc_id") % 2 == 0)
    planted = (first.where(F.col("doc_id") < 60)
                    .select((F.col("doc_id") + 100000).alias("doc_id"),
                            "text"))
    second = d.where(F.col("doc_id") % 2 == 1).unionByName(planted)

    store = tempfile.mkdtemp(prefix="heracles_ingest_store_")
    flag_near_dups_batch(spark, first, store, batch_id=0)
    flagged = flag_near_dups_batch(spark, second, store, batch_id=1)

    n_planted = planted.count()
    missed = (planted.select("doc_id")
                     .join(flagged.select("doc_id"), "doc_id",
                           "left_anti").count())
    return spark.createDataFrame(
        [(n_planted, missed == 0)],
        "n_planted long, planted_all_flagged boolean")


NEAR_DUP_INGEST_SQL = """
SELECT COUNT(*) AS n_planted, TRUE AS planted_all_flagged
FROM documents WHERE doc_id % 2 = 0 AND doc_id < 60
"""


QUERIES["stream_near_dup_ingest"] = (stream_near_dup_ingest,
                                     NEAR_DUP_INGEST_SQL)


def events_kmv_users(spark, sf_dir):
    """KMV distinct-set sketch algebra (operators/sketches.py): the
    256-minimum-hash sketches of click-users and purchase-users yield
    union/Jaccard/intersection ESTIMATES that are pure functions of
    md5 hashes — the DuckDB oracle reproduces the estimator
    bit-for-bit (not just an error contract), alongside the exact
    intersection for reference."""
    from heracles_spark.operators import sketches
    from heracles_spark.queries.relational import _events

    e = (_events(spark, sf_dir)
         .where(F.col("event_type").isin("click", "purchase"))
         .select("event_type", "user_id"))
    sk = sketches.kmv_sketch(e, "event_type", "user_id", k=256)
    est = sketches.kmv_compare(sk, "event_type", "click", "purchase",
                               k=256)
    exact = (e.groupBy("user_id")
              .agg(F.count_distinct("event_type").alias("nt"))
              .where(F.col("nt") == 2)
              .agg(F.count(F.lit(1)).alias("exact_intersection")))
    return est.crossJoin(exact)


KMV_SQL = """
WITH m AS (
  SELECT DISTINCT event_type AS s,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events WHERE event_type IN ('click', 'purchase')),
 sk AS (
  SELECT s, h FROM (
    SELECT s, h, ROW_NUMBER() OVER (PARTITION BY s ORDER BY h) AS rn
    FROM m) WHERE rn <= 256),
 sa AS (SELECT h FROM sk WHERE s = 'click'),
 sb AS (SELECT h FROM sk WHERE s = 'purchase'),
 u AS (SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT h FROM (
        SELECT h FROM sa UNION ALL SELECT h FROM sb)))
   WHERE rn <= 256),
 th AS (SELECT MAX(h) AS theta, COUNT(*) AS ku FROM u),
 mt AS (SELECT COUNT(*) AS m FROM u
        WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
 ex AS (SELECT COUNT(*) AS exact_intersection FROM (
    SELECT user_id FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY user_id HAVING COUNT(DISTINCT event_type) = 2))
SELECT
  ROUND(CASE WHEN th.ku < 256 THEN CAST(th.ku AS DOUBLE)
        ELSE 255 * 1152921504606846976.0 / th.theta END, 4) AS est_union,
  ROUND(CAST(mt.m AS DOUBLE)
        / CASE WHEN th.ku < 256 THEN CAST(th.ku AS DOUBLE)
          ELSE 256.0 END, 6) AS est_jaccard,
  ROUND(ROUND(CAST(mt.m AS DOUBLE)
              / CASE WHEN th.ku < 256 THEN CAST(th.ku AS DOUBLE)
                ELSE 256.0 END, 6)
        * ROUND(CASE WHEN th.ku < 256 THEN CAST(th.ku AS DOUBLE)
                ELSE 255 * 1152921504606846976.0 / th.theta END, 4), 4)
    AS est_intersection,
  ex.exact_intersection
FROM th, mt, ex
"""


QUERIES["events_kmv_users"] = (events_kmv_users, KMV_SQL)


def stream_sliding_counts(spark, sf_dir):
    """SLIDING windows (1h window, 15min slide — each event lands in 4
    overlapping windows): the streaming window shape tumbling queries
    don't touch, run to completion with a watermark. The oracle
    expands each event into its 4 window starts arithmetically."""
    from heracles_spark.streaming import ingest

    evt = ingest.stream_events(spark, sf_dir).where(
        F.col("event_type") == "purchase")
    out = (evt.withWatermark("ts_evt", "2 hours")
              .groupBy(F.window("ts_evt", "1 hour", "15 minutes")
                        .alias("win"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    out = out.select(F.unix_micros(F.col("win.start"))
                      .alias("window_start_us"), "n_events")
    res = ingest.run_to_completion(out, _sink_name("stream_sliding"))
    return res.orderBy("window_start_us")


SLIDING_SQL = """
WITH e AS (
  SELECT epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
 w AS (
  SELECT ((t // 900000000) - j) * 900000000 AS ws
  FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS j))
SELECT CAST(ws AS BIGINT) AS window_start_us,
       COUNT(*) AS n_events
FROM w GROUP BY ws ORDER BY window_start_us
"""


QUERIES["stream_sliding_counts"] = (stream_sliding_counts, SLIDING_SQL)


def events_rolling_dau(spark, sf_dir):
    """Rolling 7-day distinct users per day — EXACT, via the
    expand-and-distinct shape: each (day, user) pair replicates to the
    7 window-end days it contributes to, then one distinct + count.
    Rolling COUNT(DISTINCT) has no window-function form (distinct
    state isn't mergeable across frames); the 7× replication is the
    standard exact rewrite and shuffles O(7·|daily actives|), not
    O(events). Day arithmetic in epoch days keeps both engines
    integer-exact."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    day = (F.col("ts_ns") / F.lit(86_400_000_000_000)).cast("long")
    daily = (e.select(day.alias("d"), "user_id").distinct())
    expanded = (daily.withColumn(
        "window_end",
        F.explode(F.expr("sequence(d, d + 6)")))
        .select("window_end", "user_id").distinct())
    days = daily.select("d").distinct()
    return (expanded.join(days, expanded.window_end == days.d)
                    .groupBy("window_end")
                    .agg(F.count(F.lit(1)).alias("rolling_users"))
                    .select(F.col("window_end").alias("epoch_day"),
                            "rolling_users")
                    .orderBy("epoch_day"))


ROLLING_DAU_SQL = """
WITH daily AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
 expanded AS (
  SELECT DISTINCT d + j AS window_end, user_id
  FROM daily, LATERAL (SELECT unnest(generate_series(0, 6)) AS j)),
 days AS (SELECT DISTINCT d FROM daily)
SELECT CAST(e.window_end AS BIGINT) AS epoch_day,
       COUNT(*) AS rolling_users
FROM expanded e JOIN days ON e.window_end = days.d
GROUP BY e.window_end ORDER BY epoch_day
"""


QUERIES["events_rolling_dau"] = (events_rolling_dau, ROLLING_DAU_SQL)


def events_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT ingestion: parse_json(props) → VARIANT,
    variant_get typed extraction, aggregated per event_type — the
    semi-structured column path (≙ modern lakehouse JSON handling;
    the reference has no semi-structured type at all). The oracle uses
    DuckDB's JSON extraction; integer k keeps the agg exact."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (e.select("event_type", k.alias("k"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("k").alias("sum_k"),
                  F.min("k").alias("min_k"),
                  F.max("k").alias("max_k"))
             .orderBy("event_type"))


VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES["events_variant_extract"] = (events_variant_extract, VARIANT_SQL)


def events_hll_union_contract(spark, sf_dir):
    """Mergeable sketch workflow (Datasketches HLL, Spark 3.5+): build
    one user-distinct sketch PER DAY (hll_sketch_agg), then UNION the
    daily sketches (hll_union_agg) to answer "distinct users over the
    whole range" — the store-daily/query-any-range pattern that makes
    distinct counts re-aggregatable at 100 TB. Sketch bytes are
    engine-specific, so the oracle is a CONTRACT: the union estimate
    must sit within 3·rsd of the exact distinct count (pinned TRUE),
    alongside the exact value."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    day = (F.col("ts_ns") / F.lit(86_400_000_000_000)).cast("long")
    daily = (e.select(day.alias("d"), "user_id")
              .groupBy("d")
              .agg(F.expr("hll_sketch_agg(user_id, 12)").alias("sk")))
    unioned = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk, false))")
         .alias("est"))
    exact = e.agg(F.count_distinct("user_id").alias("exact_users"))
    rsd = 1.04 / (2 ** 6)          # lgK=12 → rsd ≈ 1.04/sqrt(4096)
    return (unioned.crossJoin(exact)
            .select("exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= F.lit(3 * rsd) * F.col("exact_users"))
                    .alias("union_within_bound")))


HLL_UNION_SQL = """
SELECT COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS union_within_bound
FROM events
"""


QUERIES["events_hll_union_contract"] = (events_hll_union_contract,
                                        HLL_UNION_SQL)


def events_asof_nearest(spark, sf_dir):
    """NEAREST as-of join (direction='nearest', backward wins exact
    ties — pandas merge_asof semantics): each purchase takes whichever
    click is closer in time. Completes the driver-checked direction
    matrix (backward r1+, forward r4+). The oracle carries BOTH the
    latest-preceding and earliest-following click through the
    union-window trick and picks the closer side with the same tie
    rule."""
    e = _events(spark, sf_dir)
    purchases = (e.where(F.col("event_type") == "purchase")
                  .select("user_id", "ts_ns", "event_id"))
    clicks = (e.where(F.col("event_type") == "click")
               .select("user_id", "ts_ns",
                       F.col("ts_ns").alias("click_ts_ns")))
    j = temporal.asof_join(purchases, clicks, on="ts_ns", by="user_id",
                           right_cols=["click_ts_ns"],
                           direction="nearest")
    gap_s = F.expr("abs(ts_ns - click_ts_ns_right) div 1000000000")
    return (j.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_purchases"),
                  F.sum(F.when(F.col("click_ts_ns_right").isNotNull(), 1)
                         .otherwise(0)).alias("n_matched"),
                  F.sum(F.coalesce(gap_s, F.lit(0)))
                   .cast("bigint").alias("total_gap_s"))
             .where(F.col("user_id") <= 300)
             .orderBy("user_id"))


ASOF_NEAR_SQL = """
WITH u AS (
  SELECT user_id, epoch_ns(ts) AS t, 0 AS side
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, epoch_ns(ts) AS t, 1 AS side
  FROM events WHERE event_type = 'purchase'),
 c AS (
  SELECT user_id, t, side,
         MAX(CASE WHEN side = 0 THEN t END) OVER
           (PARTITION BY user_id ORDER BY t ASC, side ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_click,
         MIN(CASE WHEN side = 0 THEN t END) OVER
           (PARTITION BY user_id ORDER BY t DESC, side ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS next_click
  FROM u),
 g AS (
  SELECT user_id,
         CASE WHEN prev_click IS NOT NULL
                   AND (next_click IS NULL
                        OR t - prev_click <= next_click - t)
              THEN t - prev_click
              WHEN next_click IS NOT NULL THEN next_click - t END AS gap
  FROM c WHERE side = 1)
SELECT user_id, COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched,
       CAST(SUM(COALESCE(gap // 1000000000, 0)) AS BIGINT) AS total_gap_s
FROM g GROUP BY user_id HAVING user_id <= 300 ORDER BY user_id
"""


QUERIES["events_asof_nearest"] = (events_asof_nearest, ASOF_NEAR_SQL)


def events_value_outliers(spark, sf_dir):
    """Per-type z-score outlier detection: mean/std from decimal-EXACT
    sums (the stats_moments discipline — native stddev accumulates in
    engine-specific order), then flag |value - mean| > 3·std. sqrt is
    IEEE-correctly-rounded, so the whole pipeline stays
    cross-engine-exact. The per-type stats broadcast back onto the
    event stream — the standard two-pass anomaly scan."""
    from pyspark.sql import Window

    from heracles_spark.queries.relational import _dsum, _events

    e = _events(spark, sf_dir).select("event_type", "event_id", "value")
    n = F.count(F.lit(1)).cast("double")
    sx = _dsum(F.col("value"))
    sxx = _dsum(F.col("value") * F.col("value"), 8)
    var = (sxx - sx * sx / n) / (n - 1)
    stats = (e.groupBy("event_type")
              .agg(n.alias("__n"), (sx / n).alias("__mean"),
                   F.sqrt(var).alias("__std")))
    flagged = (e.join(F.broadcast(stats), "event_type")
                .where(F.abs(F.col("value") - F.col("__mean"))
                       > 3 * F.col("__std")))
    return (flagged.groupBy("event_type")
                   .agg(F.count(F.lit(1)).alias("n_outliers"),
                        F.min("event_id").alias("first_outlier_id"))
                   .orderBy("event_type"))


OUTLIER_SQL = """
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE) AS sxx
  FROM events GROUP BY event_type),
 st AS (
  SELECT event_type, sx / n AS mean,
         sqrt((sxx - sx * sx / n) / (n - 1)) AS std
  FROM s)
SELECT e.event_type, COUNT(*) AS n_outliers,
       MIN(e.event_id) AS first_outlier_id
FROM events e JOIN st ON e.event_type = st.event_type
WHERE abs(e.value - st.mean) > 3 * st.std
GROUP BY e.event_type ORDER BY e.event_type
"""


QUERIES["events_value_outliers"] = (events_value_outliers, OUTLIER_SQL)


def events_funnel_3step(spark, sf_dir):
    """Three-step ordered funnel (signup → first click after signup →
    first purchase after that click): per-step user counts plus total
    signup→purchase latency over full converters. Each step is one
    min-aggregation over the co-partitioned user shuffle — the n-step
    funnel stays a chain of conditional min-aggs, never a
    sequence-explosion join."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)

    def first_after(etype, after_col, base):
        ev = (e.where(F.col("event_type") == etype)
               .select("user_id", F.col("ts_ns").alias("__t")))
        return (base.join(ev, "user_id", "left")
                    .withColumn("__ok", F.col("__t") >= F.col(after_col))
                    .groupBy(*base.columns)
                    .agg(F.min(F.when(F.col("__ok"), F.col("__t")))
                          .alias(f"first_{etype}_ns")))

    s1 = (e.where(F.col("event_type") == "signup")
           .groupBy("user_id")
           .agg(F.min("ts_ns").alias("first_signup_ns")))
    s2 = first_after("click", "first_signup_ns", s1)
    s3 = first_after("purchase", "first_click_ns", s2)
    lat_s = F.expr(
        "(first_purchase_ns - first_signup_ns) div 1000000000")
    return s3.agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.count("first_click_ns").alias("n_clicked_after"),
        F.count("first_purchase_ns").alias("n_purchased_after"),
        F.sum(F.when(F.col("first_purchase_ns").isNotNull(), lat_s))
         .cast("bigint").alias("total_latency_s"))


FUNNEL3_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(epoch_ns(ts)) AS s_ns
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
 s2 AS (
  SELECT s1.user_id, s1.s_ns, MIN(epoch_ns(e.ts)) AS c_ns
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'click'
   AND epoch_ns(e.ts) >= s1.s_ns
  GROUP BY s1.user_id, s1.s_ns),
 s3 AS (
  SELECT s2.user_id, s2.s_ns, s2.c_ns, MIN(epoch_ns(e.ts)) AS p_ns
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
   AND epoch_ns(e.ts) >= s2.c_ns
  GROUP BY s2.user_id, s2.s_ns, s2.c_ns)
SELECT COUNT(*) AS n_signed_up,
       COUNT(c_ns) AS n_clicked_after,
       COUNT(p_ns) AS n_purchased_after,
       CAST(SUM(CASE WHEN p_ns IS NOT NULL
                     THEN (p_ns - s_ns) // 1000000000 END) AS BIGINT)
         AS total_latency_s
FROM s3
"""


QUERIES["events_funnel_3step"] = (events_funnel_3step, FUNNEL3_SQL)


def events_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day: daily distinct users over rolling
    7-day distinct users (the expand-and-distinct rewrite from
    events_rolling_dau), one exact division rounded to 6 — the
    engagement ratio dashboards plot."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    day = (F.col("ts_ns") / F.lit(86_400_000_000_000)).cast("long")
    daily = e.select(day.alias("d"), "user_id").distinct()
    dau = daily.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    wau = (daily.withColumn("window_end",
                            F.explode(F.expr("sequence(d, d + 6)")))
                .select("window_end", "user_id").distinct()
                .groupBy("window_end")
                .agg(F.count(F.lit(1)).alias("wau")))
    return (dau.join(wau, dau.d == wau.window_end)
               .select(F.col("d").alias("epoch_day"), "dau", "wau",
                       F.round(F.col("dau").cast("double")
                               / F.col("wau"), 6).alias("stickiness"))
               .orderBy("epoch_day"))


STICKINESS_SQL = """
WITH daily AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
 dau AS (SELECT d, COUNT(*) AS dau FROM daily GROUP BY d),
 wau AS (
  SELECT window_end, COUNT(*) AS wau FROM (
    SELECT DISTINCT d + j AS window_end, user_id
    FROM daily, LATERAL (SELECT unnest(generate_series(0, 6)) AS j))
  GROUP BY window_end)
SELECT CAST(dau.d AS BIGINT) AS epoch_day, dau.dau, wau.wau,
       ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON dau.d = wau.window_end
ORDER BY epoch_day
"""


QUERIES["events_stickiness"] = (events_stickiness, STICKINESS_SQL)


def events_interarrival_stats(spark, sf_dir):
    """Per-type inter-arrival statistics over the GLOBAL event stream
    of that type (window lag on the time-ordered stream): n_gaps,
    mean/max gap seconds — the arrival-rate health metric. Gaps are
    exact integer nanosecond differences; the mean is one rounded
    division."""
    from pyspark.sql import Window

    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir).select("event_type", "event_id", "ts_ns")
    w = Window.partitionBy("event_type").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    return (e.withColumn("__gap", gap)
             .where(F.col("__gap").isNotNull())
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_gaps"),
                  F.round((F.sum("__gap").cast("double")
                           / F.count(F.lit(1))) / 1e9, 6)
                   .alias("mean_gap_s"),
                  (F.max("__gap") / F.lit(1_000_000_000))
                   .cast("long").alias("max_gap_s"))
             .orderBy("event_type"))


INTERARRIVAL_SQL = """
WITH g AS (
  SELECT event_type,
         epoch_ns(ts) - lag(epoch_ns(ts)) OVER
           (PARTITION BY event_type ORDER BY epoch_ns(ts), event_id)
           AS gap
  FROM events)
SELECT event_type, COUNT(*) AS n_gaps,
       ROUND((CAST(SUM(gap) AS DOUBLE) / COUNT(*)) / 1e9, 6)
         AS mean_gap_s,
       CAST(MAX(gap) // 1000000000 AS BIGINT) AS max_gap_s
FROM g WHERE gap IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


QUERIES["events_interarrival_stats"] = (events_interarrival_stats,
                                        INTERARRIVAL_SQL)


# -- PageRank (iterative, engine-exact) --------------------------------------

def nation_trade_pagerank(spark, sf_dir):
    """Weighted PageRank over the nation-level trade graph (edge
    customer-nation → supplier-nation, weight = lineitem count; built
    with three broadcast joins), 5 fixed iterations of
    operators.graph.pagerank. Engine-exact trajectory: contributions
    are two correctly-rounded double ops, per-node sums accumulate in
    decimal (order-free), so the oracle — the same 5 iterations as
    explicit chained CTEs — reproduces every rank bit-for-bit."""
    from heracles_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    edges = (li.join(o.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
                     F.col("o_custkey") == F.col("c_custkey"))
               .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                     li.l_suppkey == F.col("s_suppkey"))
               .groupBy(F.col("c_nationkey").alias("src"),
                        F.col("s_nationkey").alias("dst"))
               .agg(F.count(F.lit(1)).alias("w")))
    pr = pagerank(edges, damping=0.85, n_iter=5)
    return (pr.join(F.broadcast(n), pr.node == n.n_nationkey)
              .select(F.col("n_name").alias("nation"),
                      F.round("rank", 9).alias("pagerank"))
              .orderBy(F.desc("pagerank"), "nation"))


def _pr_iter_sql(k: int) -> str:
    prev = f"r{k - 1}" if k > 1 else "r0"
    return f"""
 r{k} AS (
  SELECT nn.node,
         0.15 / nn.n + 0.85 * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(38,18)))
                                   AS DOUBLE) AS rank
  FROM (SELECT node, n FROM nodes, cnt) nn
  LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(p.rank / ow.outw * e.w AS DECIMAL(38,18))) AS s
    FROM edges e JOIN {prev} p ON e.src = p.node
                 JOIN outw ow ON e.src = ow.src
    GROUP BY e.dst) s ON s.node = nn.node)"""


PAGERANK_SQL = ("""
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2),
 nodes AS (SELECT DISTINCT node FROM (
   SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
 cnt AS (SELECT COUNT(*) AS n FROM nodes),
 outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
 r0 AS (SELECT node, 1.0 / cnt.n AS rank FROM nodes, cnt),"""
                + ",".join(_pr_iter_sql(k) for k in range(1, 6)) + """
SELECT n.n_name AS nation, ROUND(r5.rank, 9) AS pagerank
FROM r5 JOIN nation n ON r5.node = n.n_nationkey
ORDER BY pagerank DESC, nation
""")


QUERIES["nation_trade_pagerank"] = (nation_trade_pagerank, PAGERANK_SQL)


def events_decayed_engagement(spark, sf_dir):
    """Per-user exponentially time-decayed engagement score
    (operators.temporal.decayed_sum_trailing, dyadic α=1/2 over the
    trailing 50 events): each user's LATEST score — the
    recency-weighted activity feature a ranking pipeline keeps per
    entity. Exact cross-engine: 2^-k weights are exponent shifts (no
    libm), sums in decimal."""
    from pyspark.sql import Window

    from heracles_spark.operators.temporal import decayed_sum_trailing

    e = (_events(spark, sf_dir)
         .where(F.col("user_id") <= 200)
         .select("user_id", "ts_ns", "value"))
    scored = decayed_sum_trailing(e, by="user_id", order_col="ts_ns",
                                  value_col="value", window=50)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_ns"))
    latest = (scored.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1))
    return (latest.select("user_id",
                          F.round("decayed_sum", 6).alias("engagement"))
                  .orderBy("user_id"))


DECAY_SQL = """
WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts))
           AS rn
  FROM events WHERE user_id <= 200),
 contrib AS (
  SELECT user_id, rn + k AS t,
         CAST(value / CAST(1 << k AS DOUBLE) AS DECIMAL(38,12)) AS c
  FROM e, (SELECT unnest(generate_series(0, 49)) AS k)),
 sums AS (
  SELECT user_id, t, CAST(SUM(c) AS DOUBLE) AS ds
  FROM contrib GROUP BY user_id, t),
 latest AS (
  SELECT user_id, MAX(rn) AS last_rn FROM e GROUP BY user_id)
SELECT l.user_id, ROUND(s.ds, 6) AS engagement
FROM latest l JOIN sums s ON s.user_id = l.user_id AND s.t = l.last_rn
ORDER BY l.user_id
"""


QUERIES["events_decayed_engagement"] = (events_decayed_engagement,
                                        DECAY_SQL)


def udtf_sentence_split(spark, sf_dir):
    """Python UDTF in a LATERAL position (Spark 4 table functions —
    the missing member of the UDF family next to udf_where_filter's
    scalar forms): split_sentences(text) explodes each doc into
    (idx, sentence) rows. The oracle restates the split in plain SQL,
    proving the UDTF computes what it claims."""
    from heracles_spark.functions.registry import register_builtin_udtfs

    register_builtin_udtfs(spark)
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.idx, s.sentence
        FROM __udtf_docs d,
             LATERAL split_sentences(d.text) s
        WHERE d.doc_id <= 30
        ORDER BY d.doc_id, s.idx""")


UDTF_SQL = r"""
WITH parts AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '[.!?]+')) AS raw,
         generate_subscripts(string_split_regex(text, '[.!?]+'), 1) - 1
           AS pos
  FROM documents WHERE doc_id <= 30),
 trimmed AS (
  SELECT doc_id, pos, trim(raw) AS sentence FROM parts),
 kept AS (
  SELECT doc_id, pos, sentence,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS idx
  FROM trimmed WHERE sentence <> '')
SELECT doc_id, CAST(idx AS INT) AS idx, sentence
FROM kept ORDER BY doc_id, idx
"""


QUERIES["udtf_sentence_split"] = (udtf_sentence_split, UDTF_SQL)


def events_markov_transitions(spark, sf_dir):
    """Per-user event-type TRANSITION MATRIX (the first-order Markov
    behavioral summary): lag the type over each user's time-ordered
    stream (keyed window — one shuffle on user_id), count (prev, next)
    bigrams, and attach row-normalized probabilities (one division,
    rounded — engine-exact). The ts_ns tiebreak on event_id makes the
    per-user order total, so counts are partition-independent."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir).select("user_id", "ts_ns", "event_id",
                                      "event_type")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    pairs = (e.withColumn("prev_type", F.lag("event_type").over(w))
              .where(F.col("prev_type").isNotNull()))
    counts = (pairs.groupBy("prev_type", "event_type")
                   .agg(F.count(F.lit(1)).alias("n")))
    totals = (counts.groupBy("prev_type")
                    .agg(F.sum("n").alias("row_total")))
    return (counts.join(F.broadcast(totals), "prev_type")
                  .select("prev_type", "event_type", "n",
                          F.round(F.col("n").cast("double")
                                  / F.col("row_total"), 6).alias("p"))
                  .orderBy("prev_type", "event_type"))


MARKOV_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ns(ts), event_id)
           AS prev_type
  FROM events),
 counts AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
 totals AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total
  FROM counts GROUP BY prev_type)
SELECT c.prev_type, c.event_type, c.n,
       ROUND(CAST(c.n AS DOUBLE) / t.row_total, 6) AS p
FROM counts c JOIN totals t USING (prev_type)
ORDER BY c.prev_type, c.event_type
"""


QUERIES["events_markov_transitions"] = (events_markov_transitions,
                                        MARKOV_SQL)


def events_rfm_scores(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary — the standard
    behavioral scoring): per-user aggregates, then each metric ranked
    into quintiles with ranking.with_global_ranks + ntile_col — the
    VALUE-RANGE-bucketed two-phase global rank, NOT an unpartitioned
    NTILE window (the per-user relation is ~1e9 rows at 100 TB).
    Output: quintile counts × mean metrics per (r, f, m) cell head
    (top 20 cells by population, tie-broken by scores)."""
    from heracles_spark.operators.ranking import ntile_col, with_global_ranks

    e = _events(spark, sf_dir)
    per_user = (e.groupBy("user_id")
                 .agg(F.max("ts_ns").alias("last_ns"),
                      F.count(F.lit(1)).alias("freq"),
                      F.sum(F.col("value").cast("decimal(38,6)"))
                       .cast("double").alias("monetary")))
    ranked = per_user
    for metric, score in (("last_ns", "r_score"), ("freq", "f_score"),
                          ("monetary", "m_score")):
        # with_global_ranks derives a bounds agg from its input's
        # lineage; chained naively the plan subtree doubles per metric
        # (64 source scans for 3 chained ranks). Truncate between
        # iterations so each rank pass reads a materialized leaf
        # (same discipline as graph.py's iterative CC).
        ranked = ranked.localCheckpoint(eager=True)
        ranked = with_global_ranks(
            ranked.withColumn("__m", F.col(metric).cast("double")),
            ["__m", "user_id"], rn_col="__rn", n_col="__n")
        ranked = (ranked.withColumn(
                      score, ntile_col(F.col("__rn"), F.col("__n"), 5))
                        .drop("__m", "__rn", "__n"))
    return (ranked.groupBy("r_score", "f_score", "m_score")
                  .agg(F.count(F.lit(1)).alias("n_users"),
                       F.sum(F.col("freq")).alias("sum_freq"))
                  .orderBy(F.desc("n_users"), "r_score", "f_score",
                           "m_score")
                  .limit(20))


RFM_SQL = """
WITH per_user AS (
  SELECT user_id, MAX(epoch_ns(ts)) AS last_ns, COUNT(*) AS freq,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS monetary
  FROM events GROUP BY user_id),
 scored AS (
  SELECT user_id, freq,
         NTILE(5) OVER (ORDER BY CAST(last_ns AS DOUBLE), user_id)
           AS r_score,
         NTILE(5) OVER (ORDER BY CAST(freq AS DOUBLE), user_id)
           AS f_score,
         NTILE(5) OVER (ORDER BY monetary, user_id) AS m_score
  FROM per_user)
SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
       CAST(SUM(freq) AS BIGINT) AS sum_freq
FROM scored GROUP BY 1, 2, 3
ORDER BY n_users DESC, r_score, f_score, m_score LIMIT 20
"""


QUERIES["events_rfm_scores"] = (events_rfm_scores, RFM_SQL)


def events_value_gini(spark, sf_dir):
    """Gini coefficient of per-user total event value — the inequality
    /skew summary (how concentrated is activity?). Exact rank formula
    G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n over ascending totals: ranks from
    ranking.with_global_ranks (two-phase, no single-partition window),
    both Σ terms as decimal sums (order-free), the final expression a
    fixed sequence of double ops — engine-exact."""
    from heracles_spark.operators.ranking import with_global_ranks

    e = _events(spark, sf_dir)
    per_user = (e.groupBy("user_id")
                 .agg(F.sum(F.col("value").cast("decimal(38,6)"))
                       .alias("x")))
    ranked = with_global_ranks(
        per_user.withColumn("__x", F.col("x").cast("double")),
        ["__x", "user_id"], rn_col="i", n_col="n")
    agg = ranked.agg(
        F.max("n").alias("n"),
        F.sum(F.col("x")).alias("sx"),
        F.sum(F.col("x") * F.col("i").cast("decimal(38,0)")).alias("six"))
    n = F.col("n").cast("double")
    gini = (2.0 * F.col("six").cast("double")
            / (n * F.col("sx").cast("double")) - (n + 1.0) / n)
    return agg.select(F.col("n").alias("n_users"),
                      F.round(F.col("sx").cast("double"), 6)
                       .alias("total_value"),
                      F.round(gini, 6).alias("gini"))


GINI_SQL = """
WITH per_user AS (
  SELECT user_id, SUM(CAST(value AS DECIMAL(38,6))) AS x
  FROM events GROUP BY user_id),
 ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY CAST(x AS DOUBLE), user_id)
           AS i, COUNT(*) OVER () AS n
  FROM per_user),
 agg AS (
  SELECT MAX(n) AS n, SUM(x) AS sx,
         SUM(x * CAST(i AS DECIMAL(38,0))) AS six
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n_users,
       ROUND(CAST(sx AS DOUBLE), 6) AS total_value,
       ROUND(2.0 * CAST(six AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
         AS gini
FROM agg
"""


QUERIES["events_value_gini"] = (events_value_gini, GINI_SQL)


def events_value_mad(spark, sf_dir):
    """Median absolute deviation per event type — the ROBUST dispersion
    estimate (outlier-insensitive, unlike stddev): two exact-median
    passes through the shared integer CDF walk
    (operators/orderstats.grouped_mad). Raw rows collapse to distinct
    (event_type, value) counts with a combinable hash aggregate
    (map-side partials, full parallelism); the keyed cumsum window then
    touches distinct values only — per-task work O(|distinct|), not
    O(rows per group) (round-7 rewrite of the raw-row row_number form;
    at 100 TB the old shape was 5 tasks sorting 20 TB each). The
    median is an order statistic — an actual data element — so the
    rank-⌈n/2⌉ oracle matches bit-for-bit."""
    from heracles_spark.operators.orderstats import grouped_mad

    e = (_events(spark, sf_dir)
         .select("event_type",
                 F.col("value").cast("decimal(38,6)").alias("v")))
    return (grouped_mad(e, ["event_type"], "v",
                        median_col="median_v", mad_col="mad")
            .select("event_type",
                    F.col("median_v").cast("double").alias("median_v"),
                    F.col("mad").cast("double").alias("mad"))
            .orderBy("event_type"))


MAD_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(value AS DECIMAL(38,6)) AS v
  FROM events),
 r1 AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e),
 med AS (
  SELECT event_type, v AS median_v FROM r1
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)),
 dev AS (
  SELECT e.event_type, e.event_id, ABS(e.v - m.median_v) AS ad
  FROM e JOIN med m USING (event_type)),
 r2 AS (
  SELECT event_type, ad,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ad, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev),
 mad AS (
  SELECT event_type, ad AS mad FROM r2
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT))
SELECT m.event_type, CAST(m.median_v AS DOUBLE) AS median_v,
       CAST(d.mad AS DOUBLE) AS mad
FROM med m JOIN mad d USING (event_type)
ORDER BY event_type
"""


QUERIES["events_value_mad"] = (events_value_mad, MAD_SQL)


def events_ewma_anomaly(spark, sf_dir):
    """EWMA anomaly detection over the hourly event-count series — the
    monitoring primitive that flags traffic spikes/outages per event
    type, computed EXACTLY in integer arithmetic.

    The exponentially-weighted forecast uses λ = 1/2 through a
    12-hour lookback, so the weights are the exact powers of two
    2^(12−k) and forecast·(2^12 − 1) is a pure BIGINT expression —
    no float pow() whose cross-engine rounding could flip a ranking.
    ``dev_num = y·4095 − forecast_num`` is the anomaly score in the
    same integer domain; only the display column ``forecast`` divides
    (one IEEE op, rounded). Hours with fewer than 12 OBSERVED prior
    hours are excluded via NULL lag propagation (both engines
    identical — the series is over observed hours, not gap-filled,
    and the docstring is the contract).

    Scale: raw events → hourly counts is a combinable map-side
    aggregate (the 100 TB reduction); the 12-lag window runs
    partitioned by event_type over the TINY hourly series (8.8k
    rows/type/year) — never over raw rows. Top-20 by |dev| is a
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    hourly = (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"),
                        "event_type")
               .agg(F.count(F.lit(1)).alias("y")))
    w = Window.partitionBy("event_type").orderBy("hr")
    fnum = None
    for k in range(1, 13):
        term = F.lag("y", k).over(w) * F.lit(2 ** (12 - k))
        fnum = term if fnum is None else fnum + term
    dev = F.col("y") * F.lit(4095) - F.col("fnum")
    return (hourly.withColumn("fnum", fnum)
                  .where(F.col("fnum").isNotNull())
                  .select("event_type",
                          F.col("hr").cast("string").alias("hour"),
                          "y",
                          F.col("fnum").alias("forecast_num"),
                          dev.alias("dev_num"),
                          F.round(F.col("fnum").cast("double") / 4095.0, 4)
                           .alias("forecast"))
                  .orderBy(F.abs(F.col("dev_num")).desc(),
                           "event_type", "hour")
                  .limit(20))


EWMA_SQL = """
WITH h AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, event_type,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2),
 l AS (
  SELECT event_type, hr, y,
           LAG(y, 1)  OVER w * 2048 + LAG(y, 2)  OVER w * 1024
         + LAG(y, 3)  OVER w * 512  + LAG(y, 4)  OVER w * 256
         + LAG(y, 5)  OVER w * 128  + LAG(y, 6)  OVER w * 64
         + LAG(y, 7)  OVER w * 32   + LAG(y, 8)  OVER w * 16
         + LAG(y, 9)  OVER w * 8    + LAG(y, 10) OVER w * 4
         + LAG(y, 11) OVER w * 2    + LAG(y, 12) OVER w * 1 AS fnum
  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr))
SELECT event_type, CAST(hr AS VARCHAR) AS hour, CAST(y AS BIGINT) AS y,
       CAST(fnum AS BIGINT) AS forecast_num,
       CAST(y * 4095 - fnum AS BIGINT) AS dev_num,
       ROUND(CAST(fnum AS DOUBLE) / CAST(4095 AS DOUBLE), 4) AS forecast
FROM l WHERE fnum IS NOT NULL
ORDER BY ABS(y * 4095 - fnum) DESC, event_type, hour LIMIT 20
"""


QUERIES["events_ewma_anomaly"] = (events_ewma_anomaly, EWMA_SQL)


def events_dense_hourly(spark, sf_dir):
    """Gap-filled hourly series (operators/temporal.densify_series):
    every event type's hourly-count series densified to a regular
    hour grid between its own first and last hour, missing hours
    filled with 0 — the prerequisite for calendar-correct lag/EWMA/
    seasonal windows ("previous hour", not "previous observed hour";
    the caveat events_ewma_anomaly documents is what this operator
    removes). Output reduces the dense grid to per-type coverage
    facts, all exact integers.

    Scale: raw events reduce via a combinable hourly aggregate; the
    grid is sequence+explode, rows ∝ time span — INDEPENDENT of event
    count; the fill join is co-partitioned on (type, tick). Tick
    arithmetic is field-extraction epoch math (TIMESTAMP_NTZ-safe, no
    DST dependence)."""
    from heracles_spark.operators.temporal import densify_series

    e = _events(spark, sf_dir)
    hourly = (e.groupBy("event_type",
                        F.date_trunc("hour", F.col("ts")).alias("hr"))
               .agg(F.count(F.lit(1)).alias("y")))
    dense = densify_series(hourly, ["event_type"], "hr", 3600,
                           fill={"y": 0})
    return (dense.groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n_hours"),
                      F.sum((F.col("y") > 0).cast("long"))
                       .alias("n_observed"),
                      F.sum((F.col("y") == 0).cast("long"))
                       .alias("n_gaps"),
                      F.sum("y").alias("total_events"))
                 .orderBy("event_type"))


DENSE_SQL = """
WITH h AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
           AS tick,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2),
 span AS (
  SELECT event_type, MIN(tick) AS t0, MAX(tick) AS t1
  FROM h GROUP BY 1),
 grid AS (
  SELECT event_type, unnest(generate_series(t0, t1)) AS tick
  FROM span),
 d AS (
  SELECT g.event_type, g.tick, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN h ON g.event_type = h.event_type
                         AND g.tick = h.tick)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(COUNT(CASE WHEN y > 0 THEN 1 END) AS BIGINT) AS n_observed,
       CAST(COUNT(CASE WHEN y = 0 THEN 1 END) AS BIGINT) AS n_gaps,
       CAST(SUM(y) AS BIGINT) AS total_events
FROM d GROUP BY 1 ORDER BY event_type
"""


QUERIES["events_dense_hourly"] = (events_dense_hourly, DENSE_SQL)
