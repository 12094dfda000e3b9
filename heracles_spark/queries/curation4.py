"""Fourth curation/analytics batch: group-wise OLS trend fitting
(exact integer moment sums), bigram collocation mining by integer
lift, corpus-source token-set Jaccard similarity, and reciprocal-rank
fusion of two document rankings (bucketed global ranks — no
single-task window).

Determinism discipline: every aggregate accumulates integers/decimals
(order-free exact); doubles appear only in final correctly-rounded
chains mirrored op-for-op in the DuckDB oracle (sqrt IS IEEE
correctly-rounded, so Pearson r is safe; no libm transcendentals
anywhere — collocation strength is integer lift-ppm, not log PMI).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _events, _t

QUERIES: dict = {}


def _moment_sums(d):
    """The six exact OLS moment sums over (event_type, x, y) rows —
    decimal(38,0) accumulation, order-free under any partitioning.
    ALGEBRAIC state: partial sums from disjoint slices merge by plain
    addition, which is what lets the streaming twin maintain them
    per micro-batch."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"))


def _trend_finish(a):
    """Close the moment sums into (slope, intercept, pearson_r) —
    short double chains, sqrt IEEE-exact; mirrored in TREND_SQL."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dec(F.col("n")) * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = dec(F.col("n")) * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = dec(F.col("n")) * F.col("syy") - F.col("sy") * F.col("sy")
    a = (a.withColumn("num", num).withColumn("denx", denx)
          .withColumn("deny", deny))
    fd = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = fd("num") / fd("denx") / F.lit(100.0)
    intercept = ((fd("sy") - fd("num") / fd("denx") * fd("sx"))
                 / fd("n") / F.lit(100.0))
    r = fd("num") / F.sqrt(fd("denx") * fd("deny"))
    ok = (F.col("denx") != 0) & (F.col("deny") != 0)
    return (a.select(
        "event_type", "n",
        F.when(F.col("denx") != 0, F.round(slope, 6)).alias("slope_per_day"),
        F.when(F.col("denx") != 0, F.round(intercept, 6)).alias("intercept"),
        F.when(ok, F.round(r, 6)).alias("pearson_r"))
        .orderBy("event_type"))


def events_value_trend(spark, sf_dir):
    """Per-event-type OLS trend of value over time (slope, intercept,
    Pearson r): the classic "is this metric drifting?" fit, computed
    from the five exact integer moment sums (n, Σx, Σy, Σx², Σxy, Σy²
    with x = epoch day, y = cents) accumulated in decimal(38,0) —
    order-free under any partitioning — then closed with short double
    chains. sqrt is IEEE-exact, so even r is bit-stable."""
    e = _events(spark, sf_dir)
    x = F.expr("ts_ns div 86400000000000")          # epoch day
    y = F.round(F.col("value") * 100).cast("long")  # exact cents
    d = e.select("event_type", x.alias("x"), y.alias("y"))
    return _trend_finish(_moment_sums(d))




TREND_SQL = """
WITH d AS (
  SELECT event_type,
         epoch_ns(ts) // 86400000000000 AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events),
 a AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM d GROUP BY 1),
 m AS (
  SELECT event_type, n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS denx,
         n * syy - sy * sy AS deny,
         sx, sy
  FROM a)
SELECT event_type, n,
       CASE WHEN denx <> 0 THEN
         ROUND(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) / 100.0, 6)
       END AS slope_per_day,
       CASE WHEN denx <> 0 THEN
         ROUND((CAST(sy AS DOUBLE)
                - CAST(num AS DOUBLE) / CAST(denx AS DOUBLE)
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) / 100.0, 6)
       END AS intercept,
       CASE WHEN denx <> 0 AND deny <> 0 THEN
         ROUND(CAST(num AS DOUBLE)
               / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 6)
       END AS pearson_r
FROM m ORDER BY event_type
"""


def doc_bigram_lift(spark, sf_dir):
    """Collocation mining: top-25 adjacent token bigrams by LIFT —
    P(xy) / (P(x)·P(y)) — with min-support pruning. Strength is the
    exact integer lift-ppm  (c_xy·N²·10⁶) div (Nb·c_x·c_y)  (decimal
    products, integral division), NOT log-PMI, so there is no libm in
    the ranking and the oracle is bit-identical. Top-k via
    orderBy().limit() → TakeOrderedAndProject (per-partition heaps),
    never a global sort."""
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.split(F.trim(F.lower("text")), r"\s+").alias("t"))
    uni = (toks.select(F.explode("t").alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    big = (toks.where(F.size("t") >= 2)
               .select(F.explode(F.expr(
                   "transform(sequence(2, size(t)), "
                   "i -> struct(t[i-2] AS w1, t[i-1] AS w2))")).alias("b"))
               .select("b.w1", "b.w2")
               .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy"))
               .where(F.col("cxy") >= 5))
    nu = uni.agg(F.sum("c").alias("n_uni"))
    nb = big.agg(F.sum("cxy").alias("n_big"))
    c1 = uni.where(F.col("c") >= 20) \
            .select(F.col("w").alias("w1"), F.col("c").alias("cx"))
    c2 = uni.where(F.col("c") >= 20) \
            .select(F.col("w").alias("w2"), F.col("c").alias("cy"))
    j = (big.join(c1, "w1").join(c2, "w2")
            .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb)))
    lift = F.expr(
        "(CAST(cxy AS DECIMAL(38,0)) * CAST(n_uni AS DECIMAL(38,0))"
        " * CAST(n_uni AS DECIMAL(38,0)) * CAST(1000000 AS DECIMAL(38,0)))"
        " div (CAST(n_big AS DECIMAL(38,0)) * CAST(cx AS DECIMAL(38,0))"
        " * CAST(cy AS DECIMAL(38,0)))")
    return (j.select("w1", "w2", "cxy", "cx", "cy",
                     lift.alias("lift_ppm"))
             .orderBy(F.desc("lift_ppm"), "w1", "w2")
             .limit(25))


BIGRAM_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents),
 uni AS (
  SELECT unnest(t) AS w FROM t),
 uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
 big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i)
  WHERE len(t) >= 2),
 bc AS (SELECT w1, w2, COUNT(*) AS cxy FROM big GROUP BY 1, 2
        HAVING COUNT(*) >= 5),
 nu AS (SELECT SUM(c) AS n_uni FROM uc),
 nb AS (SELECT SUM(cxy) AS n_big FROM bc),
 j AS (
  SELECT b.w1, b.w2, b.cxy, u1.c AS cx, u2.c AS cy, nu.n_uni, nb.n_big
  FROM bc b
  JOIN uc u1 ON u1.w = b.w1 AND u1.c >= 20
  JOIN uc u2 ON u2.w = b.w2 AND u2.c >= 20, nu, nb)
SELECT w1, w2, cxy, CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST((CAST(cxy AS HUGEINT) * n_uni * n_uni * 1000000)
            // (CAST(n_big AS HUGEINT) * cx * cy) AS BIGINT) AS lift_ppm
FROM j
ORDER BY lift_ppm DESC, w1, w2
LIMIT 25
"""


def doc_source_token_jaccard(spark, sf_dir):
    """Corpus-diagnostic source similarity: token-SET Jaccard between
    every pair of sources — "how much does wiki's vocabulary overlap
    web's?". Distinct (source, token) first (vocabulary-sized, the
    dedup-before-join discipline), then a self-equi-join on token
    whose per-token fan-out is bounded by the SOURCE count squared (a
    handful), never by token frequency. Union size by
    inclusion-exclusion — no second pass."""
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir)
    st = (d.select("source",
                   F.explode(F.split(F.trim(F.lower("text")),
                                     r"\s+")).alias("tok"))
           .distinct())
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = st.select(F.col("source").alias("sa"), "tok")
    b = st.select(F.col("source").alias("sb"), "tok")
    inter = (a.join(b, "tok")
              .where(F.col("sa") < F.col("sb"))
              .groupBy("sa", "sb")
              .agg(F.count(F.lit(1)).alias("inter")))
    j = (inter
         .join(sizes.select(F.col("source").alias("sa"),
                            F.col("sz").alias("sza")), "sa")
         .join(sizes.select(F.col("source").alias("sb"),
                            F.col("sz").alias("szb")), "sb"))
    jac = (F.col("inter").cast("double")
           / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"))
    return (j.select("sa", "sb", "inter", "sza", "szb",
                     F.round(jac, 6).alias("jaccard"))
             .orderBy("sa", "sb"))


SRC_JACCARD_SQL = r"""
WITH st AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents),
 sizes AS (SELECT source, COUNT(*) AS sz FROM st GROUP BY 1),
 inter AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS inter
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.sa, i.sb, i.inter, x.sz AS sza, y.sz AS szb,
       ROUND(CAST(i.inter AS DOUBLE)
             / CAST(x.sz + y.sz - i.inter AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes x ON x.source = i.sa
JOIN sizes y ON y.source = i.sb
ORDER BY i.sa, i.sb
"""


def doc_rank_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two document
    rankings — the standard way to combine heterogeneous retrieval
    scores (here: quality score and length prior) without calibrating
    them. Both global rankings use ranking.with_global_ranks (value-
    range bucketed two-pass — NO single-task window at any size);
    rrf = 1/(60+r₁) + 1/(60+r₂) is two correctly-rounded divisions
    and one add, bit-stable on any IEEE engine."""
    from heracles_spark.operators.ranking import with_global_ranks
    from heracles_spark.operators.text import with_quality_score
    from heracles_spark.queries.pipeline import _docs

    d = (with_quality_score(_docs(spark, sf_dir))
         .select("doc_id", "n_chars", "quality_score"))
    d = d.withColumn("negq", -F.col("quality_score"))
    d = with_global_ranks(d, ["negq", "doc_id"], rn_col="r_q",
                          n_col="__n1").drop("negq", "__n1")
    d = d.withColumn("negc", (-F.col("n_chars")).cast("double"))
    d = with_global_ranks(d, ["negc", "doc_id"], rn_col="r_len",
                          n_col="__n2").drop("negc", "__n2")
    rrf = (F.lit(1.0) / (F.col("r_q") + F.lit(60)).cast("double")
           + F.lit(1.0) / (F.col("r_len") + F.lit(60)).cast("double"))
    return (d.select("doc_id", "r_q", "r_len",
                     F.round(rrf, 9).alias("rrf"))
             .orderBy(F.desc("rrf"), "doc_id")
             .limit(20))


def _rrf_sql() -> str:
    from heracles_spark.queries.pipeline import _QUALITY_SQL_EXPR

    return f"""
WITH q AS (SELECT doc_id, n_chars, {_QUALITY_SQL_EXPR} AS qs
           FROM documents),
 r AS (SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY -qs, doc_id) AS r_q,
              ROW_NUMBER() OVER (ORDER BY -n_chars, doc_id) AS r_len
       FROM q)
SELECT doc_id, r_q, r_len,
       ROUND(1 / CAST(60 + r_q AS DOUBLE)
             + 1 / CAST(60 + r_len AS DOUBLE), 9) AS rrf
FROM r ORDER BY rrf DESC, doc_id LIMIT 20
"""


def stream_value_trend(spark, sf_dir):
    """Streaming maintenance of an ALGEBRAIC aggregate: the OLS moment
    sums (n, Σx, Σy, Σx², Σxy, Σy²) are additive, so each micro-batch
    (3 real deliveries, file source + foreachBatch) writes its partial
    sums and the merge is a plain SUM per event type — the streamed
    trend equals the batch events_value_trend bit-for-bit, under the
    SAME oracle (TREND_SQL). The state store holds
    O(types · deliveries) rows regardless of stream volume."""
    import os
    import tempfile

    e = _events(spark, sf_dir)
    d = e.select("event_type",
                 F.expr("ts_ns div 86400000000000").alias("x"),
                 F.round(F.col("value") * 100).cast("long").alias("y"))
    src_dir = tempfile.mkdtemp(prefix="heracles_trend_src_")
    d.repartition(3).write.mode("overwrite").format("parquet")      .save(src_dir)
    store = tempfile.mkdtemp(prefix="heracles_trend_store_")

    def _one_batch(bdf, bid):
        (_moment_sums(bdf).write.mode("overwrite").format("parquet")
         .save(os.path.join(store, f"batch={bid}")))

    sdf = (spark.readStream
                .schema("event_type string, x long, y long")
                .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (sdf.writeStream.foreachBatch(_one_batch)
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="heracles_trend_ckpt_"))
            .trigger(availableNow=True).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(300)

    partials = spark.read.format("parquet").load(store)
    merged = partials.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("sx").cast("decimal(38,0)").alias("sx"),
        F.sum("sy").cast("decimal(38,0)").alias("sy"),
        F.sum("sxx").cast("decimal(38,0)").alias("sxx"),
        F.sum("sxy").cast("decimal(38,0)").alias("sxy"),
        F.sum("syy").cast("decimal(38,0)").alias("syy"))
    return _trend_finish(merged)


QUERIES.update({
    "events_value_trend": (events_value_trend, TREND_SQL),
    "stream_value_trend": (stream_value_trend, TREND_SQL),
    "doc_bigram_lift": (doc_bigram_lift, BIGRAM_SQL),
    "doc_source_token_jaccard": (doc_source_token_jaccard,
                                 SRC_JACCARD_SQL),
    "doc_rank_fusion": (doc_rank_fusion, _rrf_sql()),
})
