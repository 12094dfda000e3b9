"""Second curation/analytics batch: record-linkage fuzzy matching,
skyline (Pareto frontier), Count-Min heavy hitters, and time-weighted
averages — each a distributed-operator family the first curation batch
didn't cover (candidate-generation joins, divide-and-conquer frontier
pruning, mergeable frequency sketches, carry-forward time weighting).

Determinism discipline as everywhere in the registry: comparisons and
integer/decimal arithmetic throughout; at most one final correctly-
rounded double division chain + ROUND, mirrored op-for-op in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from heracles_spark.queries.relational import _events, _t

QUERIES: dict = {}


def part_fuzzy_name_pairs(spark, sf_dir):
    """Entity resolution over part names: multi-pass blocking (first
    token ∪ last token) proposes candidate pairs; Levenshtein ≤ 3
    verifies. operators.linkage.fuzzy_pairs — candidates are equi-joins
    on the block keys with a stop-block cap, never all-pairs; the
    verifier runs JVM-codegen on candidates only. The oracle applies
    the identical blocking, so the pair set (including the recall
    limits of the blocking) is hash-exact."""
    from heracles_spark.operators.linkage import fuzzy_pairs

    out = fuzzy_pairs(_t(spark, sf_dir, "part"), "p_name",
                      max_dist=3, block_cap=1000)
    return (out.select("a", "b", F.col("dist").cast("long").alias("dist"))
               .orderBy("a", "b"))


FUZZY_SQL = r"""
WITH names AS (SELECT DISTINCT p_name AS a FROM part),
 k1 AS (SELECT a, string_split_regex(trim(a), '\s+')[1]  AS k FROM names),
 k2 AS (SELECT a, string_split_regex(trim(a), '\s+')[-1] AS k FROM names),
 c1 AS (SELECT k FROM k1 GROUP BY k HAVING COUNT(*) <= 1000),
 c2 AS (SELECT k FROM k2 GROUP BY k HAVING COUNT(*) <= 1000),
 cand AS (
  SELECT l.a AS a, r.a AS b
  FROM k1 l JOIN k1 r ON l.k = r.k AND l.a < r.a
  WHERE l.k IN (SELECT k FROM c1)
  UNION
  SELECT l.a, r.a
  FROM k2 l JOIN k2 r ON l.k = r.k AND l.a < r.a
  WHERE l.k IN (SELECT k FROM c2))
SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS dist
FROM cand
WHERE levenshtein(a, b) <= 3
ORDER BY a, b
"""


def part_skyline(spark, sf_dir):
    """Pareto frontier of parts under (price ↓, size ↑):
    operators.frontier.skyline — per-partition local skylines (sound
    because dominance is transitive), then one exact pass over the
    tiny union of survivors; the oracle is the textbook O(n²)
    NOT EXISTS, which the two-phase plan must equal row-for-row."""
    from heracles_spark.operators.frontier import skyline

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size")
    return (skyline(p, minimize=["p_retailprice"], maximize=["p_size"])
            .orderBy("p_retailprice", "p_size", "p_partkey"))


SKYLINE_SQL = """
SELECT p_partkey, p_name, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
ORDER BY p_retailprice, p_size, p_partkey
"""


def events_cms_heavy_hitters(spark, sf_dir):
    """Heavy hitters (users ≥ 1% of the event stream) via a Count-Min
    sketch: operators.sketches.cms_counters/cms_estimate (depth 4,
    width 512). The sketch is one hash agg with map-side combine
    (≤ 2048 counters regardless of stream size) and the probe
    broadcasts it; true counts join in only to publish the
    overcount-visible (est, true) pair. md5-seeded hashing makes
    every counter — and so every estimate, collisions included —
    bit-identical in the DuckDB oracle."""
    from heracles_spark.operators import sketches

    e = _events(spark, sf_dir)
    counters = sketches.cms_counters(e, "user_id", depth=4, width=512)
    est = (sketches.cms_estimate(counters, e, "user_id",
                                 depth=4, width=512)
           .select(F.col("user_id").cast("long").alias("user_id"), "est"))
    true_c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_c"))
    total = e.agg(F.count(F.lit(1)).alias("n"))
    return (est.join(true_c, "user_id")
               .crossJoin(F.broadcast(total))
               .where(F.col("est") * 100 >= F.col("n"))
               .select("user_id", "true_c", "est")
               .orderBy("user_id"))


CMS_SQL = """
WITH s AS (SELECT unnest(range(4)) AS seed),
 cells AS (
  SELECT s.seed,
         CAST(('0x' || substring(md5(CAST(s.seed AS VARCHAR) || ':'
                                     || CAST(e.user_id AS VARCHAR)),
                                 1, 15)) AS BIGINT) % 512 AS bucket
  FROM events e CROSS JOIN s),
 counters AS (SELECT seed, bucket, COUNT(*) AS c
              FROM cells GROUP BY 1, 2),
 probe AS (
  SELECT p.user_id, s.seed,
         CAST(('0x' || substring(md5(CAST(s.seed AS VARCHAR) || ':'
                                     || CAST(p.user_id AS VARCHAR)),
                                 1, 15)) AS BIGINT) % 512 AS bucket
  FROM (SELECT DISTINCT user_id FROM events) p CROSS JOIN s),
 est AS (
  SELECT pr.user_id, CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est
  FROM probe pr LEFT JOIN counters c USING (seed, bucket)
  GROUP BY 1),
 tru AS (SELECT user_id, COUNT(*) AS true_c FROM events GROUP BY 1),
 tot AS (SELECT COUNT(*) AS n FROM events)
SELECT e.user_id, t.true_c, e.est
FROM est e JOIN tru t USING (user_id), tot
WHERE e.est * 100 >= tot.n
ORDER BY e.user_id
"""


def events_time_weighted_value(spark, sf_dir):
    """Per-user time-weighted average of ``value`` — the
    carry-forward mean (each reading holds until the next event) that
    a plain AVG gets wrong whenever sampling is irregular. Weights are
    inter-event gaps from lead() over the per-user timeline (one
    partitioned window, no self-join); value→cents recovers the exact
    decimal, so the weighted sum accumulates order-free in
    decimal(38,0), with one final double division chain + ROUND."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    seg = (e.select("user_id", "ts_ns", "event_id", cents.alias("cents"))
            .withColumn("nxt", F.lead("ts_ns").over(w))
            .where(F.col("nxt").isNotNull())
            .withColumn("delta", F.col("nxt") - F.col("ts_ns")))
    num = F.sum((F.col("cents").cast("decimal(38,0)")
                 * F.col("delta")).cast("decimal(38,0)")).alias("num")
    den = F.sum("delta").alias("den")
    agg = seg.groupBy("user_id").agg(num, den,
                                     F.count(F.lit(1)).alias("n_segments"))
    twa = F.round(F.col("num").cast("double")
                  / F.col("den").cast("double") / F.lit(100.0), 6)
    return (agg.select("user_id", "n_segments", twa.alias("twa"))
               .orderBy("user_id"))


TWA_SQL = """
WITH seg AS (
  SELECT user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         epoch_ns(ts) AS ts_ns,
         LEAD(epoch_ns(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts), event_id)
           - epoch_ns(ts) AS delta
  FROM events),
 agg AS (
  SELECT user_id,
         SUM(CAST(cents AS HUGEINT) * delta) AS num,
         CAST(SUM(delta) AS BIGINT) AS den,
         COUNT(*) AS n_segments
  FROM seg WHERE delta IS NOT NULL GROUP BY 1)
SELECT user_id, n_segments,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100.0, 6) AS twa
FROM agg
ORDER BY user_id
"""


QUERIES.update({
    "part_fuzzy_name_pairs": (part_fuzzy_name_pairs, FUZZY_SQL),
    "part_skyline": (part_skyline, SKYLINE_SQL),
    "events_cms_heavy_hitters": (events_cms_heavy_hitters, CMS_SQL),
    "events_time_weighted_value": (events_time_weighted_value, TWA_SQL),
})
