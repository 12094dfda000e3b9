"""Fifth curation/analytics batch: readability scoring (Flesch reading
ease over pooled integer counts) and linear multi-touch attribution
(exact integer ppm credits).

Determinism discipline: aggregates accumulate INTEGER counts only
(never per-doc doubles — a sum of doubles is partition-order
dependent); the Flesch constants are literal decimals parsed
identically by both engines, and attribution credits are integral
div/% with the remainder pinned to the deterministic first touch.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from heracles_spark.queries.relational import _events

QUERIES: dict = {}


def doc_readability(spark, sf_dir):
    """Flesch reading ease per corpus source — the classic readability
    screen (quality filters often band on it). Counts are pure regexp
    aggregates (words = whitespace tokens, sentences = [.!?]+ runs
    with a ≥1 clamp, syllables ≈ [aeiouy]+ vowel groups) summed as
    integers per source; the score closes over the POOLED ratios in
    one double chain — per-doc doubles are never summed, so the
    aggregate is order-free exact."""
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir)
    low = F.trim(F.lower(F.col("text")))
    words = F.size(F.split(low, r"\s+"))
    sents = F.greatest(F.lit(1),
                       F.size(F.regexp_extract_all(
                           F.col("text"), F.lit(r"[.!?]+"), F.lit(0))))
    syll = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), F.lit(0)))
    a = (d.select("source", words.alias("w"), sents.alias("s"),
                  syll.alias("y"))
          .groupBy("source")
          .agg(F.count(F.lit(1)).alias("n_docs"),
               F.sum("w").alias("words"),
               F.sum("s").alias("sentences"),
               F.sum("y").alias("syllables")))
    fd = lambda c: F.col(c).cast("double")  # noqa: E731
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (fd("words") / fd("sentences"))
              - F.lit(84.6) * (fd("syllables") / fd("words")))
    return (a.select("source", "n_docs", "words", "sentences",
                     "syllables", F.round(flesch, 4).alias("flesch"))
             .orderBy("source"))


READABILITY_SQL = r"""
WITH d AS (
  SELECT source,
         len(string_split_regex(trim(lower(text)), '\s+')) AS w,
         GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(regexp_extract_all(trim(lower(text)), '[aeiouy]+')) AS y
  FROM documents),
 a AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS words,
         CAST(SUM(s) AS BIGINT) AS sentences,
         CAST(SUM(y) AS BIGINT) AS syllables
  FROM d GROUP BY 1)
SELECT source, n_docs, words, sentences, syllables,
       ROUND(206.835
             - 1.015 * (CAST(words AS DOUBLE)
                        / CAST(sentences AS DOUBLE))
             - 84.6 * (CAST(syllables AS DOUBLE)
                       / CAST(words AS DOUBLE)), 4) AS flesch
FROM a ORDER BY source
"""


def events_linear_attribution(spark, sf_dir):
    """Linear multi-touch attribution: every purchase distributes
    exactly 1,000,000 ppm of credit across the user's clicks in the
    prior 7 days — 10⁶ div n to each touch, remainder to the earliest
    (deterministic tie-break by event id) — answering "which
    hour-of-day's clicks drive purchases". Credits are pure integer
    div/%, so per-purchase credit sums to 10⁶ EXACTLY (unit-tested)
    and the hourly totals are engine-exact. The purchase↔click match
    is an equi-join on user plus a time-range residual — fan-out is
    bounded by one user's 7-day click activity, never global."""
    e = _events(spark, sf_dir)
    clicks = (e.where(F.col("event_type") == "click")
               .select("user_id", F.col("ts_ns").alias("c_ts"),
                       F.col("event_id").alias("c_id")))
    buys = (e.where(F.col("event_type") == "purchase")
             .select("user_id", F.col("ts_ns").alias("p_ts"),
                     F.col("event_id").alias("p_id")))
    week = 7 * 86400 * 1_000_000_000
    j = (buys.join(clicks, "user_id")
             .where((F.col("c_ts") < F.col("p_ts"))
                    & (F.col("c_ts") >= F.col("p_ts") - F.lit(week))))
    w = Window.partitionBy("p_id")
    wrn = w.orderBy("c_ts", "c_id")
    j = (j.withColumn("n", F.count(F.lit(1)).over(w))
          .withColumn("rn", F.row_number().over(wrn)))
    credit = (F.expr("1000000 div n")
              + F.when(F.col("rn") == 1,
                       F.expr("1000000 % n")).otherwise(F.lit(0)))
    hour = F.expr("(c_ts div 3600000000000) % 24")
    return (j.select(hour.alias("hour"), credit.alias("credit"))
             .groupBy("hour")
             .agg(F.count(F.lit(1)).alias("n_touches"),
                  F.sum("credit").alias("credit_ppm"))
             .orderBy("hour"))


ATTRIBUTION_SQL = """
WITH c AS (SELECT user_id, epoch_ns(ts) AS c_ts, event_id AS c_id
           FROM events WHERE event_type = 'click'),
 b AS (SELECT user_id, epoch_ns(ts) AS p_ts, event_id AS p_id
       FROM events WHERE event_type = 'purchase'),
 j AS (
  SELECT b.p_id, c.c_ts, c.c_id
  FROM b JOIN c ON b.user_id = c.user_id
   AND c.c_ts < b.p_ts AND c.c_ts >= b.p_ts - 604800000000000),
 r AS (
  SELECT p_id, c_ts,
         COUNT(*) OVER (PARTITION BY p_id) AS n,
         ROW_NUMBER() OVER (PARTITION BY p_id
                            ORDER BY c_ts, c_id) AS rn
  FROM j),
 k AS (
  SELECT (c_ts // 3600000000000) % 24 AS hour,
         1000000 // n + CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END
           AS credit
  FROM r)
SELECT hour, COUNT(*) AS n_touches,
       CAST(SUM(credit) AS BIGINT) AS credit_ppm
FROM k GROUP BY hour ORDER BY hour
"""


def doc_length_emd(spark, sf_dir):
    """Pairwise earth-mover's distance between the sources' document-
    LENGTH distributions over log₂ bins — the standard 1-D drift
    metric (EMD = Σ|CDF_A − CDF_B| over bins) complementing the TV
    divergence query. Bins come from the BIT LENGTH of n_chars+1
    (string length of bin() — pure integers, no log2-of-double floor
    hazard at powers of two); the cross-multiplied form
    Σ|cumA·N_B − cumB·N_A| keeps the whole metric in exact integers,
    with one final normalizing division."""
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir)
    b = F.length(F.expr("bin(n_chars + 1)")).alias("bin")
    h = (d.select("source", b)
          .groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c")))
    srcs = h.select("source").distinct()
    grid = (srcs.crossJoin(
                spark.range(1, 16).select(F.col("id").cast("int")
                                           .alias("bin")))
                .join(h, ["source", "bin"], "left")
                .withColumn("c", F.coalesce("c", F.lit(0))))
    wone = Window.partitionBy("source").orderBy("bin")
    cum = (grid.withColumn("cum", F.sum("c").over(wone))
               .withColumn("tot", F.sum("c").over(
                   Window.partitionBy("source"))))
    a = cum.select(F.col("source").alias("sa"), "bin",
                   F.col("cum").alias("ca"), F.col("tot").alias("na"))
    bb = cum.select(F.col("source").alias("sb"), "bin",
                    F.col("cum").alias("cb"), F.col("tot").alias("nb"))
    pair = (a.join(bb, "bin").where(F.col("sa") < F.col("sb"))
             .groupBy("sa", "sb", "na", "nb")
             .agg(F.sum(F.abs(F.col("ca") * F.col("nb")
                              - F.col("cb") * F.col("na")))
                   .alias("emd_scaled")))
    emd = (F.col("emd_scaled").cast("double")
           / (F.col("na").cast("double") * F.col("nb").cast("double")))
    return (pair.select("sa", "sb", "emd_scaled",
                        F.round(emd, 6).alias("emd_bins"))
                .orderBy("sa", "sb"))


EMD_SQL = """
WITH h AS (
  SELECT source, length(printf('%b', n_chars + 1)) AS bin,
         COUNT(*) AS c
  FROM documents GROUP BY 1, 2),
 grid AS (
  SELECT s.source, b.bin, COALESCE(h.c, 0) AS c
  FROM (SELECT DISTINCT source FROM h) s
  CROSS JOIN (SELECT unnest(range(1, 16)) AS bin) b
  LEFT JOIN h ON h.source = s.source AND h.bin = b.bin),
 cum AS (
  SELECT source, bin,
         SUM(c) OVER (PARTITION BY source ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY source) AS tot
  FROM grid),
 pair AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(a.tot AS BIGINT) AS na, CAST(b.tot AS BIGINT) AS nb,
         CAST(SUM(ABS(a.cum * b.tot - b.cum * a.tot)) AS BIGINT)
           AS emd_scaled
  FROM cum a JOIN cum b ON a.bin = b.bin AND a.source < b.source
  GROUP BY 1, 2, 3, 4)
SELECT sa, sb, emd_scaled,
       ROUND(CAST(emd_scaled AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS emd_bins
FROM pair ORDER BY sa, sb
"""


def doc_ngram_novelty(spark, sf_dir):
    """Per-source n-gram NOVELTY: what fraction of each source's word
    5-grams appear nowhere else in the corpus (document frequency 1,
    counting each doc once)? The inverse of the duplication-span
    signal — high novelty ⇒ fresh text, low ⇒ boilerplate. Grams
    travel as xxhash64 longs (8 bytes; the oracle uses gram strings —
    identical semantics, collisions ~(#grams)²/2⁶⁴ advisory, same
    convention as duplicate_ngram_spans); two combinable hash aggs
    and one gram-keyed join, AQE skew-split guards stop-grams."""
    from heracles_spark.queries.pipeline import _docs

    n = 5
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    base = (d.select("doc_id", "source", toks.alias("t"))
             .where(F.size("t") >= n))
    grams = base.select(
        "doc_id", "source",
        F.explode(F.expr(
            f"transform(sequence(0, size(t) - {n}), "
            f"i -> xxhash64(concat_ws(' ', slice(t, i + 1, {n}))))"
        )).alias("g")).distinct()          # df counts each doc once
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_src = (grams.join(df_counts, "g")
                    .groupBy("source")
                    .agg(F.count(F.lit(1)).alias("n_grams"),
                         F.sum((F.col("df") == 1).cast("long"))
                          .alias("n_novel")))
    pct = (F.col("n_novel").cast("double")
           / F.col("n_grams").cast("double"))
    return (per_src.select("source", "n_grams", "n_novel",
                           F.round(pct, 6).alias("novelty"))
                   .orderBy("source"))


NOVELTY_SQL = r"""
WITH t AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE len(string_split_regex(trim(lower(text)),
                                              '\s+')) >= 5),
 grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(list_slice(t, i, i + 4), ' ') AS g
  FROM t, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)),
 dfc AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY 1),
 per AS (
  SELECT source, COUNT(*) AS n_grams,
         CAST(SUM(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM grams JOIN dfc USING (g) GROUP BY 1)
SELECT source, n_grams, n_novel,
       ROUND(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         AS novelty
FROM per ORDER BY source
"""


def stream_bottomk_sample(spark, sf_dir):
    """Streaming deterministic reservoir: maintain the k hash-smallest
    event ids PER STRATUM across micro-batches — bottom-k by md5 is a
    MERGEABLE summary (bottom-k of a union = bottom-k of the merged
    candidates), so each foreachBatch writes its batch-local bottom-k
    (≤ k·strata rows) and the final pass re-ranks the accumulated
    candidates. The result provably equals the batch bottom-k the
    oracle computes — the streaming twin of stratified_sample_n's
    selection stage."""
    import os
    import tempfile

    k = 50
    e = _events(spark, sf_dir).select("event_id", "event_type")
    src_dir = tempfile.mkdtemp(prefix="heracles_res_src_")
    e.repartition(3).write.mode("overwrite").format("parquet")      .save(src_dir)
    store = tempfile.mkdtemp(prefix="heracles_res_store_")

    key = F.md5(F.col("event_id").cast("string"))

    def _one_batch(bdf, bid):
        w = Window.partitionBy("event_type").orderBy(key.asc(),
                                                     "event_id")
        top = (bdf.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") <= k).drop("__rn"))
        (top.write.mode("overwrite").format("parquet")
            .save(os.path.join(store, f"batch={bid}")))

    sdf = (spark.readStream.schema("event_id long, event_type string")
                .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (sdf.writeStream.foreachBatch(_one_batch)
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="heracles_res_ckpt_"))
            .trigger(availableNow=True).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(300)

    cand = spark.read.format("parquet").load(store)
    w = Window.partitionBy("event_type").orderBy(key.asc(), "event_id")
    final = (cand.withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") <= k).drop("__rn", "batch"))
    return (final.groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n_sampled"),
                      F.sum("event_id").alias("id_sum"))
                 .orderBy("event_type"))


BOTTOMK_SQL = """
WITH r AS (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events)
SELECT event_type, COUNT(*) AS n_sampled,
       CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM r WHERE rn <= 50 GROUP BY event_type ORDER BY event_type
"""


QUERIES.update({
    "doc_readability": (doc_readability, READABILITY_SQL),
    "events_linear_attribution": (events_linear_attribution,
                                  ATTRIBUTION_SQL),
    "doc_length_emd": (doc_length_emd, EMD_SQL),
    "doc_ngram_novelty": (doc_ngram_novelty, NOVELTY_SQL),
    "stream_bottomk_sample": (stream_bottomk_sample, BOTTOMK_SQL),
})
