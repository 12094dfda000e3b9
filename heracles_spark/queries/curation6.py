"""Sixth curation/analytics batch: seasonal-naive forecast backtesting
and bipartite-projection similarity (suppliers through shared parts).

Determinism discipline as everywhere: integer/decimal accumulation,
final double chains mirrored op-for-op (sqrt is IEEE-correct).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _events, _t

QUERIES: dict = {}


def events_seasonal_naive_mae(spark, sf_dir):
    """Rolling-origin backtest of the SEASONAL-NAIVE forecaster
    (ŷ_d = y_{d-7}) on daily value totals per event type — the
    baseline every time-series model must beat, and the natural
    health check for weekly-rhythm data. Daily totals are exact cent
    sums; the |error| aggregate stays in cents (integers) with one
    final division to mean absolute error."""
    e = _events(spark, sf_dir)
    day = F.expr("ts_ns div 86400000000000")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (e.select("event_type", day.alias("d"), cents.alias("c"))
              .groupBy("event_type", "d")
              .agg(F.sum("c").alias("tot")))
    lag7 = daily.select("event_type", (F.col("d") + 7).alias("d"),
                        F.col("tot").alias("pred"))
    j = daily.join(lag7, ["event_type", "d"])
    mae = (F.sum(F.abs(F.col("tot") - F.col("pred"))).cast("double")
           / F.count(F.lit(1)).cast("double") / F.lit(100.0))
    return (j.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_days"),
                  F.round(mae, 4).alias("mae"))
             .orderBy("event_type"))


SEASONAL_MAE_SQL = """
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS tot
  FROM events GROUP BY 1, 2),
 j AS (
  SELECT a.event_type, a.tot, b.tot AS pred
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d = b.d + 7)
SELECT event_type, COUNT(*) AS n_days,
       ROUND(CAST(SUM(ABS(tot - pred)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 4) AS mae
FROM j GROUP BY event_type ORDER BY event_type
"""


def supplier_shared_part_similarity(spark, sf_dir):
    """Bipartite projection: supplier similarity through SHARED PARTS
    (cosine over binary part-incidence vectors — inter/√(n_a·n_b)),
    the collaborative-filtering primitive ("suppliers like this one").
    Distinct (supplier, part) first; the self-join key is the part, so
    per-key fan-out is suppliers-per-part (TPC-H: 4), never degree of
    a hub supplier. Top-20 pairs by cosine via TakeOrdered; sqrt is
    IEEE-correctly-rounded so the ranking is bit-stable."""
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_suppkey").alias("s"),
                  F.col("l_partkey").alias("p"))
          .distinct())
    sizes = li.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    a = li.select(F.col("s").alias("sa"), "p")
    b = li.select(F.col("s").alias("sb"), "p")
    inter = (a.join(b, "p").where(F.col("sa") < F.col("sb"))
              .groupBy("sa", "sb")
              .agg(F.count(F.lit(1)).alias("inter")))
    j = (inter
         .join(sizes.select(F.col("s").alias("sa"),
                            F.col("n").alias("na")), "sa")
         .join(sizes.select(F.col("s").alias("sb"),
                            F.col("n").alias("nb")), "sb"))
    cos = (F.col("inter").cast("double")
           / F.sqrt(F.col("na").cast("double")
                    * F.col("nb").cast("double")))
    return (j.select("sa", "sb", "inter", "na", "nb",
                     F.round(cos, 6).alias("cosine"))
             .orderBy(F.desc("cosine"), "sa", "sb")
             .limit(20))


SHARED_PART_SQL = """
WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
            FROM lineitem),
 sizes AS (SELECT s, COUNT(*) AS n FROM sp GROUP BY 1),
 inter AS (
  SELECT a.s AS sa, b.s AS sb, COUNT(*) AS inter
  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2)
SELECT i.sa, i.sb, i.inter, x.n AS na, y.n AS nb,
       ROUND(CAST(i.inter AS DOUBLE)
             / sqrt(CAST(x.n AS DOUBLE) * CAST(y.n AS DOUBLE)), 6)
         AS cosine
FROM inter i
JOIN sizes x ON x.s = i.sa
JOIN sizes y ON y.s = i.sb
ORDER BY cosine DESC, i.sa, i.sb
LIMIT 20
"""


def events_burstiness(spark, sf_dir):
    """Fano factor (variance/mean of DAILY event counts) per event
    type — the overdispersion test separating Poisson-like arrivals
    (F≈1) from bursty traffic (F≫1). Exact integer identity
    F = (D·Σc² − (Σc)²) / ((D−1)·Σc) over observed-day counts:
    numerator and denominator stay exact in decimal(38,0), one final
    double division. Days with zero events are outside the observed
    support (documented; both engines see the same support)."""
    e = _events(spark, sf_dir)
    day = F.expr("ts_ns div 86400000000000")
    daily = (e.select("event_type", day.alias("d"))
              .groupBy("event_type", "d")
              .agg(F.count(F.lit(1)).alias("c")))
    a = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n_days") * F.col("s2").cast("decimal(38,0)")         - dec("s1") * F.col("s1").cast("decimal(38,0)")
    den = (dec("n_days") - 1) * F.col("s1").cast("decimal(38,0)")
    fano = F.round(num.cast("double") / den.cast("double"), 6)
    return (a.select("event_type", "n_days", F.col("s1").alias("n_events"),
                     F.when(F.col("n_days") > 1, fano).alias("fano"))
             .orderBy("event_type"))


BURSTINESS_SQL = """
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
 a AS (
  SELECT event_type, COUNT(*) AS n_days,
         CAST(SUM(c) AS BIGINT) AS s1, SUM(c * c) AS s2
  FROM daily GROUP BY 1)
SELECT event_type, n_days, s1 AS n_events,
       CASE WHEN n_days > 1 THEN
         ROUND(CAST(n_days * s2 - s1 * CAST(s1 AS HUGEINT) AS DOUBLE)
               / CAST((n_days - 1) * CAST(s1 AS HUGEINT) AS DOUBLE), 6)
       END AS fano
FROM a ORDER BY event_type
"""


def doc_split_join_pairs(spark, sf_dir):
    """Split-document detection: ordered pairs (a, b) where doc a's
    LAST 10 tokens equal doc b's FIRST 10 tokens — the crawl-pipeline
    artifact where one page was chunked into two records mid-sentence.
    One equi-join on the boundary-gram hash (xxhash64 of the joined
    10 tokens; same long-hash convention as duplicate_ngram_spans —
    the oracle joins the gram STRINGS, identical semantics);
    eligibility count published so the result is informative even
    when the corpus is clean (organic testdata: n_pairs = 0)."""
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir)
    base = (d.select("doc_id",
                     F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
             .where(F.size("t") >= 10))
    head = base.select(
        F.col("doc_id").alias("b"),
        F.xxhash64(F.concat_ws(" ", F.slice("t", 1, 10))).alias("g"))
    tail = base.select(
        F.col("doc_id").alias("a"),
        F.xxhash64(F.concat_ws(
            " ", F.expr("slice(t, size(t) - 9, 10)"))).alias("g"))
    pairs = (tail.join(head, "g")
                 .where(F.col("a") != F.col("b")))
    n_eligible = base.agg(F.count(F.lit(1)).alias("n_eligible"))
    n_pairs = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(F.col("a") + F.col("b")), F.lit(0))
         .alias("pair_id_sum"))
    return n_eligible.crossJoin(n_pairs)


SPLIT_JOIN_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 10),
 head AS (SELECT doc_id AS b,
                 array_to_string(list_slice(t, 1, 10), ' ') AS g
          FROM t),
 tail AS (SELECT doc_id AS a,
                 array_to_string(list_slice(t, len(t) - 9, len(t)),
                                 ' ') AS g
          FROM t),
 pairs AS (SELECT a, b FROM tail JOIN head USING (g) WHERE a <> b),
 ne AS (SELECT COUNT(*) AS n_eligible FROM t),
 np AS (SELECT COUNT(*) AS n_pairs,
               CAST(COALESCE(SUM(a + b), 0) AS BIGINT) AS pair_id_sum
        FROM pairs)
SELECT n_eligible, n_pairs, pair_id_sum FROM ne, np
"""


QUERIES.update({
    "events_seasonal_naive_mae": (events_seasonal_naive_mae,
                                  SEASONAL_MAE_SQL),
    "supplier_shared_part_similarity": (supplier_shared_part_similarity,
                                        SHARED_PART_SQL),
    "events_burstiness": (events_burstiness, BURSTINESS_SQL),
    "doc_split_join_pairs": (doc_split_join_pairs, SPLIT_JOIN_SQL),
})


def multimodal_png_decode(spark, sf_dir):
    """REAL PNG decode, value-oracled end-to-end: per doc, synthesize
    an 8×8 two-color checkerboard (c1 = id·{19,31,59}, c2 =
    id·{5,23,41} mod 256), write a real PNG (zlib DEFLATE, CRC'd
    chunks) with the row filters CYCLING 0→4 so the decoder walks the
    whole None/Sub/Up/Average/Paeth unfilter matrix, then decode via
    decode_image_features(decoder="png"). A checkerboard's mean luma
    is exactly (luma(c1)+luma(c2))/2, so the analytic oracle certifies
    the full inflate + unfilter path (same contract design as
    multimodal_qoi_decode)."""
    import numpy as np
    import pandas as pd

    from heracles_spark.operators import multimodal
    from heracles_spark.operators.media_codecs import encode_png
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 50).select("doc_id")

    def synth(it):
        for pdf in it:
            blobs = []
            for i in pdf["doc_id"]:
                i = int(i)
                c1 = (i * 19 % 256, i * 31 % 256, i * 59 % 256)
                c2 = (i * 5 % 256, i * 23 % 256, i * 41 % 256)
                px = np.empty((8, 8, 3), dtype=np.uint8)
                for y in range(8):
                    for x in range(8):
                        px[y, x] = c1 if (x + y) % 2 == 0 else c2
                blobs.append(encode_png(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": blobs})

    media = d.mapInPandas(synth, schema="doc_id long, content binary")
    feats = multimodal.decode_image_features(media, decoder="png")
    return (feats.select("doc_id",
                         F.round("mean_luma", 6).alias("mean_luma"))
                 .orderBy("doc_id"))


MPNG_SQL = """
SELECT doc_id,
       ROUND(((0.299 * (doc_id * 19 % 256) + 0.587 * (doc_id * 31 % 256)
               + 0.114 * (doc_id * 59 % 256))
            + (0.299 * (doc_id * 5 % 256) + 0.587 * (doc_id * 23 % 256)
               + 0.114 * (doc_id * 41 % 256))) / 2 / 255.0, 6)
         AS mean_luma
FROM documents WHERE doc_id <= 50 ORDER BY doc_id
"""


QUERIES["multimodal_png_decode"] = (multimodal_png_decode, MPNG_SQL)


def embedding_dbscan_2d(spark, sf_dir):
    """Distributed DBSCAN (grid ε-join → degree → core flag → star-CC
    over core edges → deterministic border attach; operators/
    spatial.py) on the embeddings' first-two-dimension projection in
    exact INTEGER micro-coordinates — every distance comparison is
    integer math, so cluster membership is engine-portable. The grid
    join provably equals brute force, which lets the O(n²)+recursive-
    closure DuckDB oracle certify the whole pipeline. Output: one row
    per cluster (min-id label, sizes) with noise under cluster −1."""
    from heracles_spark.operators.spatial import dbscan_2d

    e = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
              .where(F.col("vec_id") <= 2000)
              .select(F.col("vec_id").alias("id"),
                      F.round(F.element_at("embedding", 1) * 1e6)
                       .cast("long").alias("xm"),
                      F.round(F.element_at("embedding", 2) * 1e6)
                       .cast("long").alias("ym")))
    lab = dbscan_2d(e, eps=20000, min_pts=4)
    return (lab.groupBy("cluster")
               .agg(F.count(F.lit(1)).alias("n_points"),
                    F.sum(F.col("is_core").cast("long")).alias("n_core"))
               .orderBy("cluster"))


DBSCAN_SQL = """
WITH RECURSIVE p AS (
  SELECT vec_id AS id,
         CAST(ROUND(embedding[1] * 1e6) AS BIGINT) AS xm,
         CAST(ROUND(embedding[2] * 1e6) AS BIGINT) AS ym
  FROM embeddings WHERE vec_id <= 2000),
 e AS (
  SELECT a.id AS u, b.id AS v
  FROM p a JOIN p b ON a.id <> b.id
   AND (a.xm - b.xm) * (a.xm - b.xm)
     + (a.ym - b.ym) * (a.ym - b.ym) <= 400000000),
 deg AS (SELECT u, COUNT(*) AS n FROM e GROUP BY u),
 core AS (SELECT u AS id FROM deg WHERE n + 1 >= 4),
 ce AS (SELECT e.u, e.v FROM e
        WHERE e.u IN (SELECT id FROM core)
          AND e.v IN (SELECT id FROM core)),
 reach(n, r) AS (
  SELECT u, u FROM ce
  UNION
  SELECT ce.v, reach.r FROM reach JOIN ce ON ce.u = reach.n),
 lab AS (SELECT n AS id, MIN(r) AS comp FROM reach GROUP BY n),
 corelab AS (
  SELECT c.id, COALESCE(l.comp, c.id) AS cluster, 1 AS is_core
  FROM core c LEFT JOIN lab l ON l.id = c.id),
 border AS (
  SELECT e.u AS id, MIN(cl.cluster) AS cluster, 0 AS is_core
  FROM e JOIN corelab cl ON cl.id = e.v
  WHERE e.u NOT IN (SELECT id FROM core)
  GROUP BY e.u),
 allp AS (
  SELECT id, cluster, is_core FROM corelab
  UNION ALL SELECT id, cluster, is_core FROM border
  UNION ALL
  SELECT id, -1 AS cluster, 0 AS is_core FROM p
  WHERE id NOT IN (SELECT id FROM corelab)
    AND id NOT IN (SELECT id FROM border))
SELECT cluster, COUNT(*) AS n_points,
       CAST(SUM(is_core) AS BIGINT) AS n_core
FROM allp GROUP BY cluster ORDER BY cluster
"""


QUERIES["embedding_dbscan_2d"] = (embedding_dbscan_2d, DBSCAN_SQL)
