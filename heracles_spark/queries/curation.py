"""Corpus-curation analytics: distribution drift between sources,
UniMax budget allocation, CUSUM changepoint monitoring, and containment
(asymmetric near-dup) — the monitoring/mixing layer of a training-data
pipeline on top of the dedup/quality operators.

Determinism discipline (shared with the rest of the registry): every
statistic is integer/rational until one final correctly-rounded double
division + ROUND, so the driver's cross-engine value hash is exact —
no libm transcendentals inside aggregates, no order-dependent float
sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.queries.pipeline import _docs
from heracles_spark.queries.relational import _events, _t

_EPOCH_DAY_NS = 86_400_000_000_000


def doc_source_divergence(spark, sf_dir):
    """Pairwise total-variation distance between per-source term
    distributions — the distribution-drift check a corpus pipeline runs
    when a new source lands (TV, not KL: TV is a bounded metric and —
    unlike ln-based KL — computes EXACTLY in integers via
    cross-multiplication:

        TV(p, q) = sum_t |c1_t*N2 - c2_t*N1| / (2*N1*N2)

    with c the term counts and N the source totals). Terms present in
    only one source contribute c*N_other, folded in CLOSED FORM from
    the totals (sum_{t in s1 only} c1_t = N1 - sum_{t in both} c1_t),
    so only the inner join on shared terms is ever materialized.

    Scale: term counts are one hash agg with map-side combine
    (vocabulary-sized output); the shared-term join keys on term and a
    term appearing in S sources yields <= S^2 rows (|sources|^2 bound
    per term — no skew blowup on stopwords); totals are a
    |sources|-row broadcast. Products accumulate in decimal(38,0)
    (exact, order-free); the single final double division + ROUND(6) is
    correctly rounded on both engines."""
    d = _docs(spark, sf_dir)
    term = F.explode(F.split(F.trim(F.lower(F.col("text"))),
                             r"\s+")).alias("term")
    # counts is referenced three times (c1, c2, totals); materialize the
    # vocabulary-sized aggregate once so the corpus is tokenized in ONE
    # pass, not re-derived per self-join branch
    counts = (d.select("source", term)
               .groupBy("source", "term")
               .agg(F.count(F.lit(1)).alias("c"))
               .localCheckpoint(eager=True))
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    t1 = totals.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    t2 = totals.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    pairs = t1.join(t2, F.col("s1") < F.col("s2"))
    c1 = counts.select(F.col("source").alias("s1"), "term",
                       F.col("c").alias("c1"))
    c2 = counts.select(F.col("source").alias("s2"),
                       F.col("term").alias("term2"),
                       F.col("c").alias("c2"))
    dec = "decimal(38,0)"
    both = (c1.join(c2, (F.col("term") == F.col("term2"))
                    & (F.col("s1") < F.col("s2")))
              .join(F.broadcast(pairs), ["s1", "s2"])
              .groupBy("s1", "s2")
              .agg(F.sum(F.abs(F.col("c1").cast(dec) * F.col("n2")
                               - F.col("c2").cast(dec) * F.col("n1")))
                    .alias("num_both"),
                   F.sum("c1").alias("s1b"),
                   F.sum("c2").alias("s2b")))
    num = (F.coalesce(F.col("num_both"), F.lit(0).cast(dec))
           + (F.col("n1") - F.coalesce(F.col("s1b"), F.lit(0)))
           .cast(dec) * F.col("n2")
           + (F.col("n2") - F.coalesce(F.col("s2b"), F.lit(0)))
           .cast(dec) * F.col("n1"))
    return (pairs.join(both, ["s1", "s2"], "left")
                 .select("s1", "s2", "n1", "n2",
                         F.round(num.cast("double")
                                 / (F.lit(2.0) * F.col("n1")
                                    * F.col("n2")), 6).alias("tv"))
                 .orderBy("s1", "s2"))


SRC_DIV_SQL = """
WITH tok AS (
  SELECT source,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents),
 c AS (SELECT source, term, COUNT(*) AS c FROM tok GROUP BY 1, 2),
 tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1),
 pairs AS (
  SELECT t1.source AS s1, t2.source AS s2, t1.n AS n1, t2.n AS n2
  FROM tot t1 JOIN tot t2 ON t1.source < t2.source),
 shared AS (
  SELECT c1.source AS s1, c2.source AS s2,
         SUM(ABS(CAST(c1.c AS HUGEINT) * p.n2
                 - CAST(c2.c AS HUGEINT) * p.n1)) AS num_both,
         CAST(SUM(c1.c) AS BIGINT) AS s1b,
         CAST(SUM(c2.c) AS BIGINT) AS s2b
  FROM c c1
  JOIN c c2 ON c1.term = c2.term AND c1.source < c2.source
  JOIN pairs p ON p.s1 = c1.source AND p.s2 = c2.source
  GROUP BY 1, 2)
SELECT p.s1, p.s2, p.n1, p.n2,
       ROUND(CAST(COALESCE(b.num_both, 0)
                  + CAST(p.n1 - COALESCE(b.s1b, 0) AS HUGEINT) * p.n2
                  + CAST(p.n2 - COALESCE(b.s2b, 0) AS HUGEINT) * p.n1
                  AS DOUBLE)
             / (2.0 * p.n1 * p.n2), 6) AS tv
FROM pairs p LEFT JOIN shared b ON b.s1 = p.s1 AND b.s2 = p.s2
ORDER BY 1, 2
"""


def doc_unimax_budget(spark, sf_dir):
    """UniMax water-filling token budget over sources: 2/5 of the
    corpus's total whitespace tokens, spread as uniformly as the
    3-epoch per-source cap allows (operators.sampling.unimax_allocation
    — closed-form prefix-sum water line, pure integers, windows over
    the one-row-per-source relation only)."""
    from heracles_spark.operators.sampling import unimax_allocation

    d = _docs(spark, sf_dir)
    toks = d.select("source", F.array_size(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("ntok"))
    return (unimax_allocation(toks, group_col="source", size_col="ntok",
                              epochs_cap=3, budget_frac=(2, 5))
            .orderBy("source"))


UNIMAX_SQL = """
WITH sz AS (
  SELECT source,
         CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+')))
              AS BIGINT) AS sz
  FROM documents GROUP BY 1),
 b AS (SELECT (SUM(sz) * 2) // 5 AS budget FROM sz),
 ranked AS (
  SELECT source, sz, sz * 3 AS cap, b.budget,
         ROW_NUMBER() OVER (ORDER BY sz * 3, source) AS k,
         COALESCE(SUM(sz * 3) OVER (ORDER BY sz * 3, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS prefix,
         COUNT(*) OVER () AS n
  FROM sz CROSS JOIN b),
 starred AS (
  SELECT *,
         MIN(CASE WHEN cap * (n - k + 1) >= budget - prefix
                  THEN k END) OVER () AS kstar
  FROM ranked),
 marked AS (
  SELECT *,
         MAX(CASE WHEN k = kstar THEN budget - prefix END) OVER () AS r
  FROM starred)
SELECT source, sz, cap,
       CAST(CASE WHEN kstar IS NULL OR k < kstar THEN cap
                 ELSE r // (n - kstar + 1)
                      + (CASE WHEN k - kstar < r % (n - kstar + 1)
                              THEN 1 ELSE 0 END)
            END AS BIGINT) AS alloc,
       ROUND(CAST(CASE WHEN kstar IS NULL OR k < kstar THEN cap
                       ELSE r // (n - kstar + 1)
                            + (CASE WHEN k - kstar < r % (n - kstar + 1)
                                    THEN 1 ELSE 0 END)
                  END AS DOUBLE) / sz, 6) AS epochs
FROM marked ORDER BY source
"""


def events_cusum_changepoint(spark, sf_dir):
    """One-sided CUSUM changepoint monitor on daily event counts, per
    event type — the drift alarm a pipeline puts on ingest volume.
    Textbook CUSUM is the recursion C_d = max(0, C_{d-1} + x_d - mu -
    slack); window functions can't express recursion, but the one-sided
    form has the exact prefix-sum identity

        C_d = S_d - min_{j <= d} S_j,   S_d = sum_{i<=d} (x_i - mu - s)

    (running sum minus its running minimum). With mu = T/n the per-type
    daily mean, slack = mu/4 and alarm threshold h = 5*mu, everything
    scales by 4n into pure integers: S'_d = 4n*P_d - 5*T*d, alarm iff
    C'_d > 20*T. Windows are PARTITIONED by event_type over the daily
    relation (O(days) per type), integer-exact end to end; the one
    final division by 4n reports max CUSUM in original units."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    daily = (e.select(F.expr(f"ts_ns div {_EPOCH_DAY_NS}").alias("d"),
                      "event_type")
              .groupBy("event_type", "d")
              .agg(F.count(F.lit(1)).alias("x")))
    wt = Window.partitionBy("event_type")
    wo = (Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0))
    scored = (daily
              .withColumn("t_total", F.sum("x").over(wt))
              .withColumn("n_days", F.count(F.lit(1)).over(wt))
              .withColumn("p", F.sum("x").over(wo))
              .withColumn("idx", F.row_number().over(
                  Window.partitionBy("event_type").orderBy("d")))
              .withColumn("s", 4 * F.col("n_days") * F.col("p")
                          - 5 * F.col("t_total") * F.col("idx"))
              .withColumn("smin", F.min("s").over(wo))
              .withColumn("cusum", F.col("s") - F.col("smin")))
    alarm = F.col("cusum") > 20 * F.col("t_total")
    return (scored.groupBy("event_type")
                  .agg(F.max("n_days").alias("n_days"),
                       F.sum(F.when(alarm, 1).otherwise(0))
                        .alias("n_alarms"),
                       F.min(F.when(alarm, F.col("d")))
                        .alias("first_alarm_day"),
                       F.round((F.max("cusum")
                                / (4 * F.max("n_days"))).cast("double"),
                               6).alias("max_cusum"))
                  .orderBy("event_type"))


CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2),
 scored AS (
  SELECT event_type, d, x,
         SUM(x) OVER (PARTITION BY event_type) AS t_total,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days,
         SUM(x) OVER (PARTITION BY event_type ORDER BY d) AS p,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS idx
  FROM daily),
 cus AS (
  SELECT *,
         4 * n_days * p - 5 * t_total * idx AS s
  FROM scored),
 final AS (
  SELECT *, s - MIN(s) OVER (PARTITION BY event_type ORDER BY d) AS cusum
  FROM cus)
SELECT event_type,
       CAST(MAX(n_days) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN cusum > 20 * t_total THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarms,
       MIN(CASE WHEN cusum > 20 * t_total THEN d END) AS first_alarm_day,
       ROUND(CAST(MAX(cusum) AS DOUBLE) / (4 * MAX(n_days)), 6)
         AS max_cusum
FROM final GROUP BY 1 ORDER BY 1
"""


def doc_ngram_containment(spark, sf_dir):
    """Directed containment near-dup: C(a -> b) = |grams(a) n grams(b)|
    / |grams(a)| over distinct word 3-gram sets — the asymmetric
    cousin of Jaccard that catches a SHORT document embedded inside a
    LONG one (quote inclusion, boilerplate wrapping), which symmetric
    Jaccard under-scores. Exact on a bounded slice (doc_id <= 300) as
    the oracle-checkable form; the production path at 100 TB feeds the
    same scoring with candidate pairs from the banded-LSH generators in
    operators.dedup (containment's intersection term is the same
    shared-gram count the Jaccard scorer uses — only the denominator
    changes, so the PPJoin-style prefix filtering carries over).

    Integer count ratio -> one final division, ROUND(6)."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") <= 300)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = (d.select("doc_id", toks.alias("t"))
              .select("doc_id", "t",
                      F.posexplode(F.col("t")).alias("pos", "w"))
              .where(F.col("pos") + 3 <= F.array_size(F.col("t")))
              .select("doc_id", F.concat_ws(
                  " ", F.col("w"),
                  F.element_at(F.col("t"), F.col("pos") + 2),
                  F.element_at(F.col("t"), F.col("pos") + 3))
                  .alias("g"))
              .distinct())
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    g1 = grams.select(F.col("doc_id").alias("a"), "g")
    g2 = grams.select(F.col("doc_id").alias("b"),
                      F.col("g").alias("g2"))
    shared = (g1.join(g2, (F.col("g") == F.col("g2"))
                      & (F.col("a") != F.col("b")))
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("shared")))
    sa = sizes.select(F.col("doc_id").alias("a"),
                      F.col("sz").alias("size_a"))
    # threshold in INTEGERS (shared/size_a >= 1/10 <=> 10*shared >= size_a)
    # so the cut never sits on a float-rounding boundary cross-engine
    return (shared.join(sa, "a")
                  .where(F.col("shared") * 10 >= F.col("size_a"))
                  .select("a", "b", "shared", "size_a",
                          F.round(F.col("shared").cast("double")
                                  / F.col("size_a"), 6)
                           .alias("containment"))
                  .orderBy("a", "b"))


CONTAIN_SQL = """
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE doc_id <= 300),
 grams AS (
  SELECT DISTINCT doc_id,
         t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' '
           || t[CAST(i AS INT) + 2] AS g
  FROM docs, range(1, 200000) r(i) WHERE i + 2 <= len(t)),
 sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY 1),
 shared AS (
  SELECT g1.doc_id AS a, g2.doc_id AS b, COUNT(*) AS shared
  FROM grams g1 JOIN grams g2
    ON g1.g = g2.g AND g1.doc_id <> g2.doc_id
  GROUP BY 1, 2)
SELECT s.a, s.b, s.shared, z.sz AS size_a,
       ROUND(CAST(s.shared AS DOUBLE) / z.sz, 6) AS containment
FROM shared s JOIN sizes z ON z.doc_id = s.a
WHERE s.shared * 10 >= z.sz
ORDER BY 1, 2
"""


QUERIES = {
    "doc_source_divergence": (doc_source_divergence, SRC_DIV_SQL),
    "doc_unimax_budget": (doc_unimax_budget, UNIMAX_SQL),
    "events_cusum_changepoint": (events_cusum_changepoint, CUSUM_SQL),
    "doc_ngram_containment": (doc_ngram_containment, CONTAIN_SQL),
}


def doc_zipf_slope(spark, sf_dir):
    """Zipf power-law fit of the corpus term-frequency spectrum: least
    squares on (floor(log2 rank), floor(log2 freq)) over the whole
    vocabulary. The log2 floors come from INTEGER BIT LENGTH
    (length(bin(x)) - 1), not libm — exact on every engine — and the
    regression's closed form

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2)

    keeps both numerators and the denominator in integer aggregates
    (decimal(38,0), order-free); only the TWO final divisions are
    floating point, each correctly rounded, then ROUND(6).

    Scale: term counts are one combinable hash agg; the global
    frequency rank uses ranking.with_global_ranks (value-range
    bucketed two-phase — no single-task sort over a 10^8-term
    vocabulary); the regression is one more combinable agg to a single
    row."""
    from heracles_spark.operators.ranking import with_global_ranks

    d = _docs(spark, sf_dir)
    term = F.explode(F.split(F.trim(F.lower(F.col("text"))),
                             r"\s+")).alias("term")
    counts = (d.select(term).groupBy("term")
               .agg(F.count(F.lit(1)).alias("freq")))
    ranked = with_global_ranks(
        counts.withColumn("__m", -F.col("freq").cast("double")),
        ["__m", "term"], rn_col="rank", n_col="__n")
    dec = "decimal(38,0)"
    pts = ranked.select(
        (F.length(F.bin(F.col("rank"))) - 1).cast(dec).alias("x"),
        (F.length(F.bin(F.col("freq"))) - 1).cast(dec).alias("y"))
    agg = pts.agg(F.count(F.lit(1)).cast(dec).alias("n"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(F.col("x") * F.col("y")).alias("sxy"),
                  F.sum(F.col("x") * F.col("x")).alias("sxx"))
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                .cast("double") / den.cast("double"), 6).alias("slope"),
        F.round((F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
                .cast("double") / den.cast("double"), 6)
         .alias("intercept"))


ZIPF_SQL = """
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents),
 c AS (SELECT term, COUNT(*) AS freq FROM tok GROUP BY 1),
 ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY CAST(-freq AS DOUBLE), term)
           AS rank
  FROM c),
 pts AS (
  SELECT CAST(length(bin(rank)) - 1 AS HUGEINT) AS x,
         CAST(length(bin(freq)) - 1 AS HUGEINT) AS y
  FROM ranked),
 agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
       ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept
FROM agg
"""


def events_value_percentile_sketch(spark, sf_dir):
    """Mergeable-sketch percentiles with a RANK CONTRACT oracle: Spark's
    percentile_approx (Greenwald-Khanna/KLL family — the sketch that
    merges across 100 TB partitions) promises rank(q_hat_p) within
    eps*n of p*n for accuracy 1/eps. Sketch internals are
    engine-specific, so — like approx_distinct — the oracle pins the
    CONTRACT: for each p we count rows <= q_hat (one broadcast of the
    3 quantiles back over the data) and check |rank - p*n| <= eps*n,
    rendered as booleans the SQL oracle fixes at TRUE. The exact n and
    the contract bits are the hashed values; the sketch estimate
    itself never enters the hash."""
    e = _events(spark, sf_dir)
    eps = 0.01  # accuracy = 100
    q = e.agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 100)
              .alias("qs"), F.count(F.lit(1)).alias("n"))
    probed = (e.crossJoin(F.broadcast(q))
               .agg(F.max("n").alias("n"),
                    *[F.sum(F.when(F.col("value")
                                   <= F.element_at("qs", i + 1), 1)
                            .otherwise(0)).alias(f"r{i}")
                      for i in range(3)]))
    checks = [
        (F.abs(F.col(f"r{i}") - F.lit(p) * F.col("n"))
         <= F.lit(eps) * F.col("n")).alias(f"within_eps_p{int(p*100)}")
        for i, p in enumerate((0.5, 0.9, 0.99))]
    return probed.select(F.col("n").alias("n_rows"), *checks)


PCTL_SKETCH_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS within_eps_p50, TRUE AS within_eps_p90,
       TRUE AS within_eps_p99
FROM events
"""


def embedding_label_balance(spark, sf_dir):
    """Class-balance audit of a labeled embedding set: per-label counts
    plus the corpus-level Gini-Simpson diversity 1 - sum(c_i*(c_i-1)) /
    (n*(n-1)) and max/min imbalance ratio — the checks run before
    training a probe/classifier on the labels. Pure integer until two
    final divisions (ROUND 6). One combinable count agg; the label
    relation is tiny."""
    from heracles_spark.queries.pipeline import _embs

    em = _embs(spark, sf_dir)
    c = em.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    dec = "decimal(38,0)"
    return (c.agg(F.count(F.lit(1)).alias("n_labels"),
                  F.sum("c").alias("n"),
                  F.min("c").alias("min_c"), F.max("c").alias("max_c"),
                  F.sum(F.col("c").cast(dec) * (F.col("c") - 1))
                   .alias("ss"))
             .select("n_labels", F.col("n").cast("long").alias("n_rows"),
                     F.round(F.lit(1.0) - F.col("ss").cast("double")
                             / (F.col("n").cast("double")
                                * (F.col("n") - 1).cast("double")), 6)
                      .alias("gini_simpson"),
                     F.round(F.col("max_c").cast("double")
                             / F.col("min_c"), 6)
                      .alias("imbalance_ratio")))


LABEL_BAL_SQL = """
WITH c AS (SELECT label, COUNT(*) AS c FROM embeddings GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_labels,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       ROUND(1.0 - CAST(SUM(CAST(c AS HUGEINT) * (c - 1)) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) - 1 AS DOUBLE)),
             6) AS gini_simpson,
       ROUND(CAST(MAX(c) AS DOUBLE) / MIN(c), 6) AS imbalance_ratio
FROM c
"""


QUERIES.update({
    "doc_zipf_slope": (doc_zipf_slope, ZIPF_SQL),
    "events_value_percentile_sketch": (events_value_percentile_sketch,
                                       PCTL_SKETCH_SQL),
    "embedding_label_balance": (embedding_label_balance, LABEL_BAL_SQL),
})


def orders_open_backlog(spark, sf_dir):
    """Open-order backlog over time by SWEEP LINE: each order
    contributes +1 on its order day and -1 the day after its last
    shipment; the running sum of per-day net deltas IS the number of
    simultaneously-open orders. This turns interval stacking (how many
    intervals cover day d) into two combinable aggregations plus one
    cumulative sum over the per-DAY delta relation — O(|days|) rows
    (a few thousand for years of data) regardless of order count, so
    the ordered cumsum is the deliberate tiny-relation exception
    (unimax/ranking-offset discipline), NOT a window over orders.
    Reported per month: backlog at month end and the intra-month peak.
    All integers; day arithmetic in epoch days."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    start = (o.select(F.col("o_orderkey"),
                      F.datediff(F.col("o_orderdate").cast("date"),
                                 F.lit("1970-01-01").cast("date"))
                       .alias("d")))
    close = (li.groupBy("l_orderkey")
               .agg((F.max(F.datediff(F.col("l_shipdate").cast("date"),
                                      F.lit("1970-01-01").cast("date")))
                     + 1).alias("d")))
    deltas = (start.select("d", F.lit(1).alias("delta"))
              .unionAll(close.select("d", F.lit(-1).alias("delta")))
              .groupBy("d").agg(F.sum("delta").alias("net")))
    # full day spine (min..max, a few thousand rows): without it the
    # cumsum exists only on event days and a month whose backlog is all
    # carry-in from earlier months would lose its true peak/end value
    spine = (deltas.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
                   .select(F.explode(F.sequence("mn", "mx")).alias("d")))
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    daily = (spine.join(deltas, "d", "left")
                  .withColumn("open_orders",
                              F.sum(F.coalesce(F.col("net"), F.lit(0)))
                               .over(wc)))
    month = F.substring(F.date_add(F.lit("1970-01-01").cast("date"),
                                   F.col("d").cast("int")).cast("string"),
                        1, 7)
    return (daily.withColumn("month", month)
                 .groupBy("month")
                 .agg(F.max_by("open_orders", F.col("d"))
                       .alias("month_end_backlog"),
                      F.max("open_orders").alias("peak_backlog"))
                 .orderBy("month"))


BACKLOG_SQL = """
WITH s AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d, 1 AS delta
  FROM orders),
 c AS (
  SELECT MAX(CAST(l_shipdate AS DATE) - DATE '1970-01-01') + 1 AS d,
         -1 AS delta
  FROM lineitem GROUP BY l_orderkey),
 net AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS net
  FROM (SELECT * FROM s UNION ALL SELECT * FROM c) GROUP BY d),
 spine AS (
  SELECT unnest(range((SELECT MIN(d) FROM net),
                      (SELECT MAX(d) FROM net) + 1)) AS d),
 daily AS (
  SELECT sp.d, SUM(COALESCE(net.net, 0)) OVER (ORDER BY sp.d)
           AS open_orders
  FROM spine sp LEFT JOIN net ON net.d = sp.d),
 m AS (
  SELECT strftime(DATE '1970-01-01' + INTERVAL (d) DAY, '%Y-%m')
           AS month,
         d, open_orders
  FROM daily)
SELECT month,
       CAST(MAX_BY(open_orders, d) AS BIGINT) AS month_end_backlog,
       CAST(MAX(open_orders) AS BIGINT) AS peak_backlog
FROM m GROUP BY month ORDER BY month
"""


def doc_dup_cluster_spectrum(spark, sf_dir):
    """Duplicate-multiplicity spectrum: histogram of PREFIX-FINGERPRINT
    cluster sizes (docs sharing their first 8 normalized tokens — the
    cheap candidate-cluster key crawl dedup uses before any pairwise
    scoring) plus the share of the corpus each size class occupies —
    the first diagnostic a dedup pass prints ("what fraction of the
    corpus is 2x copies vs 1000x boilerplate?"). Two combinable hash
    aggregations (fingerprint, then size); pure integers until one
    ROUND(6) share. Swap the key for md5(text) to get the exact-dup
    spectrum — same plan."""
    d = _docs(spark, sf_dir)
    prefix = F.concat_ws(" ", F.slice(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8))
    clusters = (d.groupBy(F.md5(prefix).alias("h"))
                 .agg(F.count(F.lit(1)).alias("s")))
    tot = clusters.agg(F.sum("s").alias("n_docs_total"))
    return (clusters.groupBy("s")
                    .agg(F.count(F.lit(1)).alias("n_clusters"))
                    .join(F.broadcast(tot))
                    .select(F.col("s").alias("cluster_size"),
                            "n_clusters",
                            (F.col("s") * F.col("n_clusters"))
                             .alias("n_docs"),
                            F.round((F.col("s") * F.col("n_clusters"))
                                    .cast("double")
                                    / F.col("n_docs_total"), 6)
                             .alias("corpus_share"))
                    .orderBy("cluster_size"))


DUP_SPECTRUM_SQL = """
WITH cl AS (
  SELECT md5(array_to_string(
           string_split_regex(trim(lower(text)), '\\s+')[1:8], ' '))
           AS h,
         COUNT(*) AS s
  FROM documents GROUP BY 1),
 tot AS (SELECT CAST(SUM(s) AS BIGINT) AS n FROM cl)
SELECT s AS cluster_size, COUNT(*) AS n_clusters,
       CAST(s * COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(s * COUNT(*) AS DOUBLE) / MAX(tot.n), 6)
         AS corpus_share
FROM cl CROSS JOIN tot GROUP BY s, tot.n ORDER BY cluster_size
"""


def orders_priority_chi2(spark, sf_dir):
    """Chi-square test of independence for order priority x order status —
    the association check behind "does final status depend on
    the priority an order was placed at?". Per-cell contribution

        (O*n - rt*ct)^2 / (n*rt*ct)

    keeps the numerator in decimal(38,0) integers (O*n overflows int64
    at scale); each cell does ONE correctly-rounded double division +
    ROUND(6), and the chi2 total is the sum of the ROUNDED per-cell
    decimals (decimal sum = order-free, so the total is engine-exact
    too — no order-dependent float accumulation). Contingency cells
    are a |priorities|x|statuses| relation (~15 rows); everything after the
    first count agg is broadcast-sized."""
    o = _t(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    # cells (~15 rows) feeds four downstream branches; checkpoint so the
    # base table is scanned ONCE, not re-derived per marginal
    cells = (o.groupBy("o_orderpriority", "o_orderstatus")
               .agg(F.count(F.lit(1)).alias("o"))
               .localCheckpoint(eager=True))
    rt = cells.groupBy("o_orderpriority").agg(F.sum("o").alias("rt"))
    ct = cells.groupBy("o_orderstatus").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("n"))
    num = (F.col("o").cast(dec) * F.col("n")
           - F.col("rt").cast(dec) * F.col("ct"))
    contrib = F.round(
        (num * num).cast("double")
        / (F.col("n").cast("double") * F.col("rt") * F.col("ct")), 6)
    scored = (cells.join(F.broadcast(rt), "o_orderpriority")
                   .join(F.broadcast(ct), "o_orderstatus")
                   .join(F.broadcast(n))
                   .withColumn("contrib", contrib))
    total = scored.agg(
        F.sum(F.col("contrib").cast("decimal(38,6)")).cast("double")
         .alias("chi2"),
        ((F.count_distinct("o_orderpriority") - 1)
         * (F.count_distinct("o_orderstatus") - 1)).alias("dof"))
    return (scored.join(F.broadcast(total))
                  .select("o_orderpriority", "o_orderstatus",
                          F.col("o").alias("observed"), "contrib",
                          F.round("chi2", 6).alias("chi2_total"), "dof")
                  .orderBy("o_orderpriority", "o_orderstatus"))


CHI2_SQL = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS o
  FROM orders GROUP BY 1, 2),
 rt AS (SELECT o_orderpriority, CAST(SUM(o) AS BIGINT) AS rt
        FROM cells GROUP BY 1),
 ct AS (SELECT o_orderstatus, CAST(SUM(o) AS BIGINT) AS ct
        FROM cells GROUP BY 1),
 n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
 scored AS (
  SELECT c.o_orderpriority, c.o_orderstatus, c.o,
         ROUND(CAST((CAST(c.o AS HUGEINT) * n.n - CAST(r.rt AS HUGEINT)
                     * t.ct)
                    * (CAST(c.o AS HUGEINT) * n.n - CAST(r.rt AS HUGEINT)
                       * t.ct) AS DOUBLE)
               / (CAST(n.n AS DOUBLE) * r.rt * t.ct), 6) AS contrib
  FROM cells c
  JOIN rt r USING (o_orderpriority) JOIN ct t USING (o_orderstatus)
  CROSS JOIN n),
 tot AS (
  SELECT CAST(SUM(CAST(contrib AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
         CAST((COUNT(DISTINCT o_orderpriority) - 1)
              * (COUNT(DISTINCT o_orderstatus) - 1) AS BIGINT) AS dof
  FROM scored)
SELECT s.o_orderpriority, s.o_orderstatus, s.o AS observed, s.contrib,
       ROUND(tot.chi2, 6) AS chi2_total, tot.dof
FROM scored s CROSS JOIN tot
ORDER BY s.o_orderpriority, s.o_orderstatus
"""


QUERIES.update({
    "orders_open_backlog": (orders_open_backlog, BACKLOG_SQL),
    "doc_dup_cluster_spectrum": (doc_dup_cluster_spectrum,
                                 DUP_SPECTRUM_SQL),
    "orders_priority_chi2": (orders_priority_chi2, CHI2_SQL),
})


def doc_bloom_prefilter(spark, sf_dir):
    """Incremental-ingest dedup PREFILTER: a relational Bloom filter
    over the historical corpus's prefix fingerprints screens an
    incoming batch before any expensive pairwise work — the shape a
    100 TB pipeline uses nightly (the bit set is <= m rows no matter
    how big history gets, so it broadcasts forever;
    operators.dedup.bloom_bits/bloom_prefilter). md5-derived positions
    make the filter DETERMINISTIC: no false negatives by construction
    AND the false-positive count is an exact engine-portable number,
    so the oracle checks real values, not a probabilistic contract.
    Split: doc_id % 5 == 0 is the incoming batch, the rest is
    history; key = first-8-token prefix fingerprint."""
    from heracles_spark.operators.dedup import bloom_bits, bloom_prefilter

    d = _docs(spark, sf_dir)
    key = F.md5(F.concat_ws(" ", F.slice(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8)))
    hist = (d.where(F.col("doc_id") % 5 != 0)
             .select(key.alias("key")).distinct())
    inc = (d.where(F.col("doc_id") % 5 == 0)
            .select("doc_id", key.alias("key")))
    bits = bloom_bits(hist, "key")
    flagged = bloom_prefilter(inc, bits, "key")
    true_dups = inc.join(hist, "key", "left_semi")
    n_inc = inc.agg(F.count(F.lit(1)).alias("n_incoming"))
    n_flag = flagged.agg(F.count(F.lit(1)).alias("n_flagged"))
    n_true = true_dups.agg(F.count(F.lit(1)).alias("n_true_dups"))
    return (n_inc.join(F.broadcast(n_flag))
                 .join(F.broadcast(n_true))
                 .select("n_incoming", "n_flagged", "n_true_dups",
                         (F.col("n_flagged") - F.col("n_true_dups"))
                          .alias("n_false_pos"),
                         (F.col("n_flagged") >= F.col("n_true_dups"))
                          .alias("no_false_negatives")))


BLOOM_SQL = """
WITH keyed AS (
  SELECT doc_id,
         md5(array_to_string(
           string_split_regex(trim(lower(text)), '\\s+')[1:8], ' '))
           AS key
  FROM documents),
 hist AS (SELECT DISTINCT key FROM keyed WHERE doc_id % 5 <> 0),
 inc AS (SELECT doc_id, key FROM keyed WHERE doc_id % 5 = 0),
 bits AS (
  SELECT DISTINCT
         CAST(('0x' || substring(md5(key || ':' || i), 1, 8)) AS BIGINT)
           % 262144 AS b
  FROM hist, range(0, 3) r(i)),
 probe AS (
  SELECT doc_id, key,
         CAST(('0x' || substring(md5(key || ':' || i), 1, 8)) AS BIGINT)
           % 262144 AS pos
  FROM inc, range(0, 3) r(i)),
 flagged AS (
  SELECT doc_id FROM probe JOIN bits ON probe.pos = bits.b
  GROUP BY doc_id, key HAVING COUNT(*) = 3),
 truth AS (
  SELECT doc_id FROM inc WHERE key IN (SELECT key FROM hist))
SELECT CAST((SELECT COUNT(*) FROM inc) AS BIGINT) AS n_incoming,
       CAST((SELECT COUNT(*) FROM flagged) AS BIGINT) AS n_flagged,
       CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_dups,
       CAST((SELECT COUNT(*) FROM flagged) AS BIGINT)
         - CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_false_pos,
       (SELECT COUNT(*) FROM flagged) >= (SELECT COUNT(*) FROM truth)
         AS no_false_negatives
"""


QUERIES.update({
    "doc_bloom_prefilter": (doc_bloom_prefilter, BLOOM_SQL),
})


def embedding_matryoshka_fidelity(spark, sf_dir):
    """Matryoshka truncation fidelity: how well cosine similarity under
    the first d dims (d = 8/16/32) tracks the full 64-dim cosine —
    the measurement behind MRL-style "use a prefix of the embedding
    at serving time" decisions. Pairs are (vec_id, vec_id+1) — a
    deterministic O(n) pairing, no quadratic blowup. Per pair and d,
    |cos_d - cos_64| rounds to 6 before a DECIMAL mean (order-free
    sum), so the aggregate is engine-exact; dot products/norms ride
    the same sequential-fold expressions as the KNN oracle family
    (operators.similarity.dot_expr/norm_expr)."""
    from heracles_spark.operators import similarity
    from heracles_spark.queries.pipeline import _embs

    e = _embs(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("pid"),
                 F.col("embedding").alias("va"))
    b = e.select((F.col("vec_id") - 1).alias("pid"),
                 F.col("embedding").alias("vb"))
    pairs = a.join(b, "pid")

    def cos(va, vb):
        return (similarity.dot_expr(va, vb)
                / (similarity.norm_expr(va) * similarity.norm_expr(vb)))

    full = cos(F.col("va"), F.col("vb"))
    # all three truncation deltas in ONE pass (explode a 3-struct
    # array), not a 3-way union that re-scans the table per dim
    triples = F.array(*[
        F.struct(F.lit(d).alias("dim"),
                 F.round(F.abs(cos(F.slice("va", 1, d),
                                   F.slice("vb", 1, d)) - full), 6)
                  .alias("delta"))
        for d in (8, 16, 32)])
    u = (pairs.select(F.explode(triples).alias("t"))
              .select(F.col("t.dim").alias("dim"),
                      F.col("t.delta").alias("delta")))
    return (u.groupBy("dim")
             .agg(F.count(F.lit(1)).alias("n_pairs"),
                  F.round(F.sum(F.col("delta").cast("decimal(38,6)"))
                           .cast("double") / F.count(F.lit(1)), 6)
                   .alias("mean_abs_delta"),
                  F.max("delta").alias("max_abs_delta"))
             .orderBy("dim"))


MATRYOSHKA_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS pid, a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1),
 terms AS (
  SELECT p.pid, dd.d,
         CAST(p.va[i] AS DOUBLE) * CAST(p.vb[i] AS DOUBLE) AS xy,
         CAST(p.va[i] AS DOUBLE) * CAST(p.va[i] AS DOUBLE) AS xx,
         CAST(p.vb[i] AS DOUBLE) * CAST(p.vb[i] AS DOUBLE) AS yy,
         i
  FROM pairs p, (VALUES (8), (16), (32)) dd(d), range(1, 65) t(i)),
 cosd AS (
  SELECT pid, d,
         SUM(CASE WHEN i <= d THEN xy END)
           / (SQRT(SUM(CASE WHEN i <= d THEN xx END))
              * SQRT(SUM(CASE WHEN i <= d THEN yy END))) AS cos_d,
         SUM(xy) / (SQRT(SUM(xx)) * SQRT(SUM(yy))) AS cos_full
  FROM terms GROUP BY pid, d),
 deltas AS (
  SELECT d AS dim, ROUND(ABS(cos_d - cos_full), 6) AS delta
  FROM cosd)
SELECT dim, COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(CAST(delta AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_abs_delta,
       MAX(delta) AS max_abs_delta
FROM deltas GROUP BY dim ORDER BY dim
"""


QUERIES.update({
    "embedding_matryoshka_fidelity": (embedding_matryoshka_fidelity,
                                      MATRYOSHKA_SQL),
})


def supplier_concentration_hhi(spark, sf_dir):
    """Herfindahl-Hirschman supply-concentration index per nation: with
    c_s the lineitem count of supplier s, HHI = sum(c_s^2) / (sum c_s)^2
    — 1/HHI is the effective number of suppliers. Pure integer
    numerator/denominator (decimal(38,0) squares), one final division.
    Scale: one combinable (nation, supplier) count, one nation-level
    merge — no windows, no self-joins."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    dec = "decimal(38,0)"
    per_supp = (li.join(s.select("s_suppkey", "s_nationkey"),
                        li.l_suppkey == F.col("s_suppkey"))
                  .groupBy("s_nationkey", "s_suppkey")
                  .agg(F.count(F.lit(1)).alias("c")))
    per_nation = (per_supp.groupBy("s_nationkey")
                  .agg(F.count(F.lit(1)).alias("n_suppliers"),
                       F.sum("c").alias("tot"),
                       F.sum(F.col("c").cast(dec) * F.col("c"))
                        .alias("ss")))
    return (per_nation
            .join(F.broadcast(n.select("n_nationkey", "n_name")),
                  per_nation.s_nationkey == F.col("n_nationkey"))
            .select("n_name", "n_suppliers",
                    F.col("tot").alias("n_lineitems"),
                    F.round(F.col("ss").cast("double")
                            / (F.col("tot").cast("double")
                               * F.col("tot")), 6).alias("hhi"))
            .orderBy("n_name"))


HHI_SQL = """
WITH per_supp AS (
  SELECT s.s_nationkey, l.l_suppkey, COUNT(*) AS c
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2),
 per_nation AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers,
         CAST(SUM(c) AS BIGINT) AS tot,
         SUM(CAST(c AS HUGEINT) * c) AS ss
  FROM per_supp GROUP BY 1)
SELECT n.n_name, p.n_suppliers, p.tot AS n_lineitems,
       ROUND(CAST(p.ss AS DOUBLE)
             / (CAST(p.tot AS DOUBLE) * p.tot), 6) AS hhi
FROM per_nation p JOIN nation n ON p.s_nationkey = n.n_nationkey
ORDER BY n.n_name
"""


def events_dow_adjusted_outliers(spark, sf_dir):
    """Seasonality-adjusted volume outliers: daily event counts per
    type, residual against the type's DAY-OF-WEEK mean (so weekly
    rhythm isn't flagged as anomaly), alarm when the residual exceeds
    2x the dow mean. All comparisons in cross-multiplied integers:
    (x*n_dow - t_dow) > 2*t_dow with t_dow the dow total and n_dow its
    day count — no float thresholds. Partitioned aggregations only."""
    e = _events(spark, sf_dir)
    day = F.expr(f"ts_ns div {_EPOCH_DAY_NS}")
    daily = (e.select(day.alias("d"), "event_type")
              .groupBy("event_type", "d")
              .agg(F.count(F.lit(1)).alias("x"))
              .withColumn("dow", F.pmod(F.col("d") + 4, F.lit(7))))
    dow_stats = (daily.groupBy("event_type", "dow")
                      .agg(F.sum("x").alias("t_dow"),
                           F.count(F.lit(1)).alias("n_dow")))
    j = daily.join(dow_stats, ["event_type", "dow"])
    resid_hi = (10 * (F.col("x") * F.col("n_dow") - F.col("t_dow"))
                > F.col("t_dow"))
    return (j.where(resid_hi)
             .select("event_type", "d", "dow", "x",
                     F.round(F.col("t_dow").cast("double")
                             / F.col("n_dow"), 6).alias("dow_mean"))
             .orderBy("event_type", "d"))


DOW_OUT_SQL = """
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS d, COUNT(*) AS x
  FROM events GROUP BY 1, 2),
 dowed AS (
  SELECT *, (d + 4) % 7 AS dow FROM daily),
 stats AS (
  SELECT event_type, dow, CAST(SUM(x) AS BIGINT) AS t_dow,
         COUNT(*) AS n_dow
  FROM dowed GROUP BY 1, 2)
SELECT d.event_type, d.d, d.dow, d.x,
       ROUND(CAST(s.t_dow AS DOUBLE) / s.n_dow, 6) AS dow_mean
FROM dowed d JOIN stats s USING (event_type, dow)
WHERE 10 * (d.x * s.n_dow - s.t_dow) > s.t_dow
ORDER BY d.event_type, d.d
"""


QUERIES.update({
    "supplier_concentration_hhi": (supplier_concentration_hhi, HHI_SQL),
    "events_dow_adjusted_outliers": (events_dow_adjusted_outliers,
                                     DOW_OUT_SQL),
})
