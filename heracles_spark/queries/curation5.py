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


QUERIES.update({
    "doc_readability": (doc_readability, READABILITY_SQL),
    "events_linear_attribution": (events_linear_attribution,
                                  ATTRIBUTION_SQL),
})
