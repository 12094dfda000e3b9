"""Third curation/analytics batch: triangle counting (degree-ordered
orientation), end-to-end entity resolution (blocking → verify →
components → canonical), integer-exact stratified sampling (Hamilton
apportionment + hash-deterministic selection), hashing-trick linear
model inference, and a Benford first-digit audit.

Determinism discipline as everywhere in the registry: comparisons and
integer/decimal arithmetic throughout; doubles only in final
correctly-rounded chains mirrored op-for-op in the DuckDB oracle
(Benford probabilities are shared LITERAL constants, not libm calls,
so both engines parse the identical double).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _events, _t

QUERIES: dict = {}


def supplier_triangle_count(spark, sf_dir):
    """Triangle count of the supplier AFFINITY graph (suppliers
    co-appearing in ≥ 4 distinct orders share an edge — the standard
    support threshold that sparsifies a co-occurrence projection
    before cubic structure mining): operators.graph.triangle_count —
    (degree, id)-ordered edge orientation bounds the wedge join's
    fan-out by O(sqrt(m)) per node (Suri-Vassilvitskii), so the plan
    survives hub suppliers. Triangle enumeration is inherently
    Σ outdeg² work on ANY engine ("the curse of the last reducer"):
    the support threshold is the documented density knob — the raw
    co-order projection has near-constant degree ~10³ at every SF,
    which no algorithm makes cheap. The oracle is the naive
    id-oriented 3-way self-join over the same thresholded edge set."""
    from heracles_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    r = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_suppkey").alias("sk"))
    pairs = (li.join(r, li.l_orderkey == r.ok)
               .where(F.col("l_suppkey") < F.col("sk"))
               .select("l_orderkey",
                       F.col("l_suppkey").alias("u"),
                       F.col("sk").alias("v"))
               .distinct())                  # one vote per order
    edges = (pairs.groupBy("u", "v")
                  .agg(F.count(F.lit(1)).alias("w"))
                  .where(F.col("w") >= 4)
                  .select("u", "v"))
    return triangle_count(edges)


TRIANGLE_SQL = """
WITH po AS (
  SELECT DISTINCT l1.l_orderkey AS o, l1.l_suppkey AS a,
                  l2.l_suppkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey),
 co AS (SELECT a, b FROM po GROUP BY a, b HAVING COUNT(*) >= 4),
 nn AS (SELECT COUNT(*) AS n_nodes FROM
        (SELECT a AS s FROM co UNION SELECT b FROM co)),
 mm AS (SELECT COUNT(*) AS n_edges FROM co),
 tt AS (SELECT COUNT(*) AS n_triangles
        FROM co e1
        JOIN co e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN co e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT n_nodes, n_edges, n_triangles FROM nn, mm, tt
"""


def part_entity_resolution(spark, sf_dir):
    """End-to-end entity resolution on part names: blocked fuzzy
    matching (operators.linkage.fuzzy_pairs, Levenshtein ≤ 3 on
    blocked candidates only) → connected components (star contraction,
    O(log n) rounds) → one canonical name per entity (component min)
    with name/row coverage counts. The full composition — candidate
    generation, exact transitive closure, canonicalization — under one
    value oracle (recursive-CTE closure in DuckDB)."""
    from heracles_spark.operators.graph import connected_components
    from heracles_spark.operators.linkage import fuzzy_pairs

    part = _t(spark, sf_dir, "part")
    pairs = fuzzy_pairs(part, "p_name", max_dist=3, block_cap=1000)
    comp = connected_components(pairs.select("a", "b"), src="a", dst="b")
    rows = (part.select("p_name")
                .join(comp.withColumnRenamed("id", "p_name"),
                      "p_name", "left")
                .withColumn("canonical",
                            F.coalesce("component", "p_name")))
    out = (rows.groupBy("canonical")
               .agg(F.countDistinct("p_name").alias("n_names"),
                    F.count(F.lit(1)).alias("n_rows")))
    return out.where(F.col("n_names") >= 2).orderBy("canonical")


ER_SQL = r"""
WITH RECURSIVE names AS (SELECT DISTINCT p_name AS a FROM part),
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
  WHERE l.k IN (SELECT k FROM c2)),
 pairs AS (SELECT a, b FROM cand WHERE levenshtein(a, b) <= 3),
 sym AS (SELECT a AS u, b AS v FROM pairs
         UNION SELECT b AS u, a AS v FROM pairs),
 reach(n, r) AS (
  SELECT u, u FROM sym
  UNION
  SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.n),
 labels AS (SELECT n AS id, MIN(r) AS component FROM reach GROUP BY n),
 assigned AS (
  SELECT p.p_name, COALESCE(l.component, p.p_name) AS canonical
  FROM part p LEFT JOIN labels l ON p.p_name = l.id),
 g AS (SELECT canonical, COUNT(DISTINCT p_name) AS n_names,
              COUNT(*) AS n_rows
       FROM assigned GROUP BY 1)
SELECT canonical, CAST(n_names AS BIGINT) AS n_names, n_rows
FROM g WHERE n_names >= 2 ORDER BY canonical
"""


def events_stratified_sample(spark, sf_dir):
    """Stratified sample of 1000 events apportioned across event
    types by largest-remainder (Hamilton) allocation — all-integer
    (div/%/rank), so WHICH strata get the leftover slots is
    bit-reproducible — with per-stratum membership = the alloc
    hash-smallest event ids (operators.sampling.stratified_sample_n,
    salted two-phase bottom-k). The id-sum checksum pins exact
    membership, not just counts."""
    from heracles_spark.operators.sampling import stratified_sample_n

    e = _events(spark, sf_dir).select("event_id", "event_type")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n"))
    strata = counts.select("event_type",
                           F.col("__n").alias("n_stratum"))
    sampled = stratified_sample_n(e, "event_type", 1000, "event_id")
    picked = (sampled.groupBy("event_type")
                     .agg(F.count(F.lit(1)).alias("n_sampled"),
                          F.sum("event_id").alias("id_sum")))
    return (strata.join(picked, "event_type")
                  .select("event_type", "n_stratum",
                          "n_sampled", "id_sum")
                  .orderBy("event_type"))


STRATIFIED_SQL = """
WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
 t AS (SELECT SUM(n) AS ntot FROM c),
 a0 AS (SELECT event_type, n,
               (1000 * n) // ntot AS base, (1000 * n) % ntot AS rem
        FROM c, t),
 s AS (SELECT SUM(base) AS sb FROM a0),
 a AS (SELECT event_type, n,
              LEAST(base + CASE WHEN ROW_NUMBER() OVER
                     (ORDER BY rem DESC, event_type) <= 1000 - sb
                   THEN 1 ELSE 0 END, n) AS alloc
       FROM a0, s),
 r AS (SELECT event_type, event_id,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
       FROM events),
 sel AS (SELECT r.event_type, r.event_id
         FROM r JOIN a USING (event_type) WHERE r.rn <= a.alloc),
 ss AS (SELECT event_type, COUNT(*) AS n_sampled,
               CAST(SUM(event_id) AS BIGINT) AS id_sum
        FROM sel GROUP BY 1)
SELECT a.event_type, CAST(a.n AS BIGINT) AS n_stratum,
       ss.n_sampled, ss.id_sum
FROM a JOIN ss USING (event_type)
ORDER BY a.event_type
"""


def doc_quality_lr_score(spark, sf_dir):
    """Hashing-trick linear-model inference over documents — the
    fasttext-style quality-classifier scoring pass a curation pipeline
    runs at full corpus width, expressed entirely in JVM codegen (no
    Python in the hot path): token → md5 feature index (mod 1024),
    md5-derived integer milli-weights (a stand-in for trained weights
    with the same storage/broadcast shape), per-doc score
    z = Σ w[idx] / (1000·n_tokens) ∈ [-1, 1], histogrammed into 10
    integer buckets via cross-multiplied integer division (no float
    floor anywhere). Mean raw score per bucket is the one final
    double division."""
    from heracles_spark.queries.pipeline import _docs

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"))
    idx = (F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
            .cast("long") % 1024)
    wm = (F.conv(F.substring(
              F.md5(F.concat(F.lit("w:"), idx.cast("string"))), 1, 15),
              16, 10).cast("long") % 2001) - 1000
    per = (toks.select("doc_id", wm.alias("w"))
               .groupBy("doc_id")
               .agg(F.sum("w").alias("z"),
                    F.count(F.lit(1)).alias("n")))
    bucket = F.expr("(10 * (z + 1000 * n)) div (2000 * n)")
    out = (per.select(bucket.alias("bucket"), "z", "n")
              .groupBy("bucket")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.round(F.sum("z").cast("double")
                           / F.sum("n").cast("double") / F.lit(1000.0),
                           6).alias("mean_score")))
    return out.orderBy("bucket")


LR_SCORE_SQL = r"""
WITH ex AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents),
 feat AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 1024
           AS idx
  FROM ex),
 wt AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5('w:' || CAST(idx AS VARCHAR)),
                                 1, 15)) AS BIGINT) % 2001 - 1000 AS w
  FROM feat),
 per AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS z, COUNT(*) AS n
         FROM wt GROUP BY 1),
 b AS (SELECT (10 * (z + 1000 * n)) // (2000 * n) AS bucket, z, n
       FROM per)
SELECT bucket, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(z) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) / 1000.0,
             6) AS mean_score
FROM b GROUP BY bucket ORDER BY bucket
"""


# Benford first-digit probabilities log10(1 + 1/d) as shared literal
# constants: both engines parse the identical decimal → identical
# double, so the chi-square chain is bit-deterministic (no libm).
_BENFORD = [0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
            0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
            0.05799194697768673, 0.05115252244738129, 0.04575749056067514]


def orders_benford_digits(spark, sf_dir):
    """Benford first-digit audit of order totals — the classic
    anomaly/fraud screen for financial columns. The first significant
    digit comes from the STRING form of the exact cents integer (never
    log10 of a double, whose floor misbehaves at powers of ten);
    expected probabilities are shared literal constants, and each
    digit's chi-square contribution is one short double chain mirrored
    op-for-op in the oracle."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (o.select(digit.alias("digit"))
            .groupBy("digit").agg(F.count(F.lit(1)).alias("obs")))
    total = o.agg(F.count(F.lit(1)).alias("N"))
    digits = (spark.range(1, 10)
                   .select(F.col("id").cast("int").alias("digit"),
                           F.element_at(
                               F.array(*[F.lit(p) for p in _BENFORD]),
                               F.col("id").cast("int")).alias("p")))
    j = (digits.join(obs, "digit", "left")
               .withColumn("obs", F.coalesce("obs", F.lit(0)))
               .crossJoin(F.broadcast(total)))
    diff = F.col("obs").cast("double") - F.col("N").cast("double") * F.col("p")
    chi2 = diff * diff / (F.col("N").cast("double") * F.col("p"))
    return (j.select("digit", "obs",
                     F.round("p", 6).alias("benford_p"),
                     F.round(chi2, 4).alias("chi2_term"))
             .orderBy("digit"))


BENFORD_SQL = """
WITH d0 AS (
  SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders),
 obs AS (SELECT digit, COUNT(*) AS obs FROM d0 GROUP BY 1),
 tot AS (SELECT COUNT(*) AS N FROM orders),
 exp AS (
  SELECT * FROM (VALUES
    (1, 0.3010299956639812), (2, 0.17609125905568124),
    (3, 0.12493873660829992), (4, 0.09691001300805642),
    (5, 0.07918124604762482), (6, 0.06694678963061322),
    (7, 0.05799194697768673), (8, 0.05115252244738129),
    (9, 0.04575749056067514)) AS v(digit, p))
SELECT e.digit, COALESCE(o.obs, 0) AS obs,
       ROUND(e.p, 6) AS benford_p,
       ROUND((CAST(COALESCE(o.obs, 0) AS DOUBLE)
              - CAST(t.N AS DOUBLE) * e.p)
             * (CAST(COALESCE(o.obs, 0) AS DOUBLE)
                - CAST(t.N AS DOUBLE) * e.p)
             / (CAST(t.N AS DOUBLE) * e.p), 4) AS chi2_term
FROM exp e LEFT JOIN obs o USING (digit), tot t
ORDER BY e.digit
"""


def stream_cms_heavy_hitters(spark, sf_dir):
    """Incremental sketch maintenance in Structured Streaming: the
    event stream arrives as 3 micro-batches (file source,
    maxFilesPerTrigger=1); foreachBatch computes each batch's PARTIAL
    Count-Min sketch (operators.sketches.cms_counters — the map-side
    partials of the batch operator, now materialized per delivery)
    and appends it to a parquet store; the merged sketch is one
    counter-wise SUM over the store. Because CMS merge is exactly
    counter addition, the streamed sketch equals the batch sketch
    bit-for-bit — the oracle rebuilds it from the full stream and the
    heavy-hitter set (users ≥ 1% of events) must match, collisions
    included."""
    import os
    import tempfile

    from heracles_spark.operators import sketches

    e = _events(spark, sf_dir).select("user_id")
    src_dir = tempfile.mkdtemp(prefix="heracles_cms_src_")
    # 3 deliveries; the split is round-robin (content-irrelevant:
    # counter sums are order- and partition-free)
    e.repartition(3).write.mode("overwrite").format("parquet") \
     .save(src_dir)

    store = tempfile.mkdtemp(prefix="heracles_cms_store_")

    def _one_batch(bdf, bid):
        part = sketches.cms_counters(bdf, "user_id", depth=4, width=512)
        (part.write.mode("overwrite").format("parquet")
             .save(os.path.join(store, f"batch={bid}")))

    sdf = (spark.readStream.schema("user_id long")
                .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = (sdf.writeStream.foreachBatch(_one_batch)
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="heracles_cms_ckpt_"))
            .trigger(availableNow=True).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(300)

    merged = (spark.read.format("parquet").load(store)
                   .groupBy("seed", "bucket")
                   .agg(F.sum("c").alias("c")))
    full = _events(spark, sf_dir)
    est = (sketches.cms_estimate(merged, full, "user_id",
                                 depth=4, width=512)
           .select(F.col("user_id").cast("long").alias("user_id"),
                   "est"))
    true_c = full.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_c"))
    total = full.agg(F.count(F.lit(1)).alias("n"))
    return (est.join(true_c, "user_id")
               .crossJoin(F.broadcast(total))
               .where(F.col("est") * 100 >= F.col("n"))
               .select("user_id", "true_c", "est")
               .orderBy("user_id"))


STREAM_CMS_SQL = """
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


QUERIES.update({
    "supplier_triangle_count": (supplier_triangle_count, TRIANGLE_SQL),
    "part_entity_resolution": (part_entity_resolution, ER_SQL),
    "events_stratified_sample": (events_stratified_sample, STRATIFIED_SQL),
    "doc_quality_lr_score": (doc_quality_lr_score, LR_SCORE_SQL),
    "orders_benford_digits": (orders_benford_digits, BENFORD_SQL),
    "stream_cms_heavy_hitters": (stream_cms_heavy_hitters, STREAM_CMS_SQL),
})
