"""Relational corpus, batch 3: pivot/unpivot, explode/UNNEST, array
functions over embeddings, GROUPING SETS — rounding out the inherited
surface (the reference exercises arrays via temp views,
HBaseSQLQuerySuite.scala:157-181; grouping sets are post-reference
Spark surface included for completeness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _t, _dsum, _osum


def pivot_status_by_priority(spark, sf_dir):
    """Pivot (conditional-aggregation equivalent): order counts by
    priority pivoted on status."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
             .pivot("o_orderstatus", ["F", "O", "P"])
             .agg(F.count(F.lit(1)))
             .na.fill(0)
             .orderBy("o_orderpriority"))


PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def unpivot_metrics(spark, sf_dir):
    """Unpivot (stack): wide per-nation metrics → long (metric, value)."""
    c = _t(spark, sf_dir, "customer")
    wide = (c.groupBy("c_nationkey")
             .agg(F.count(F.lit(1)).cast("double").alias("n_customers"),
                  _dsum(F.col("c_acctbal")).alias("total_bal")))
    return (wide.unpivot("c_nationkey", ["n_customers", "total_bal"],
                         "metric", "value")
                .orderBy("c_nationkey", "metric"))


UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT c_nationkey, CAST(COUNT(*) AS DOUBLE) AS n_customers,
         {_osum('c_acctbal')} AS total_bal
  FROM customer GROUP BY c_nationkey)
SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT c_nationkey, 'total_bal' AS metric, total_bal AS value FROM wide
ORDER BY c_nationkey, metric
"""


def explode_tokens(spark, sf_dir):
    """explode (≙ UNNEST): token frequency over documents — the word-count
    shape every text pipeline starts with."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return (d.select(F.explode(toks).alias("tok"))
             .groupBy("tok")
             .agg(F.count(F.lit(1)).alias("freq"))
             .orderBy(F.desc("freq"), "tok")
             .limit(25))


EXPLODE_SQL = """
SELECT tok, COUNT(*) AS freq
FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents)
GROUP BY tok ORDER BY freq DESC, tok LIMIT 25
"""


def array_functions(spark, sf_dir):
    """Array function batch over embeddings: size/slice/contains-ish/
    min/max/sort — per-row, exactly representable floats."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") <= 30)
    emb = F.col("embedding")
    return (e.select("vec_id",
                     F.array_size(emb).alias("dim"),
                     F.round(F.array_max(emb).cast("double"), 6).alias("vmax"),
                     F.round(F.array_min(emb).cast("double"), 6).alias("vmin"),
                     F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_v"),
                     F.round(F.element_at(emb, -1).cast("double"), 6).alias("last_v"),
                     F.array_size(F.filter(emb, lambda x: x > 0)).alias("n_pos"))
             .orderBy("vec_id"))


ARRF_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
       ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
       ROUND(CAST(embedding[-1] AS DOUBLE), 6) AS last_v,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
FROM embeddings WHERE vec_id <= 30 ORDER BY vec_id
"""


def grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via SQL (Spark grammar) vs DuckDB's."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST
    """)


GS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def first_last_value(spark, sf_dir):
    """first_value/last_value window frame semantics."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    from pyspark.sql import Window

    w = (Window.partitionBy("o_custkey")
               .orderBy("o_orderdate", "o_orderkey")
               .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (o.select("o_custkey", "o_orderkey",
                     F.first("o_totalprice").over(w).alias("first_price"),
                     F.last("o_totalprice").over(w).alias("last_price"))
             .orderBy("o_custkey", "o_orderkey"))


FLV_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price
FROM orders WHERE o_custkey <= 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def ntile_percentiles(spark, sf_dir):
    """ntile bucketing + percent_rank (distribution analytics) — via the
    two-pass global-rank operator (operators.ranking.with_global_ranks:
    value-bucketed ranks + broadcast offsets), NOT a bare
    Window.orderBy, which would sort the whole table in one task."""
    from heracles_spark.operators.ranking import (
        ntile_col, percent_rank_col, with_global_ranks)

    c = _t(spark, sf_dir, "customer")
    ranked = with_global_ranks(c, ["c_acctbal", "c_custkey"])
    rn, n = F.col("__rn"), F.col("__n")
    return (ranked.select("c_custkey",
                          ntile_col(rn, n, 4).alias("quartile"),
                          F.round(percent_rank_col(rn, n), 6)
                           .alias("pct_rank"))
                  .where(F.col("c_custkey") <= 40)
                  .orderBy("c_custkey"))


NTILE_SQL = """
SELECT c_custkey, CAST(q AS INT) AS quartile, ROUND(pr, 6) AS pct_rank FROM (
  SELECT c_custkey,
         NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS q,
         PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS pr
  FROM customer)
WHERE c_custkey <= 40 ORDER BY c_custkey
"""


QUERIES = {
    "pivot_status_by_priority": (pivot_status_by_priority, PIVOT_SQL),
    "unpivot_metrics": (unpivot_metrics, UNPIVOT_SQL),
    "explode_tokens": (explode_tokens, EXPLODE_SQL),
    "array_functions": (array_functions, ARRF_SQL),
    "grouping_sets": (grouping_sets, GS_SQL),
    "first_last_value": (first_last_value, FLV_SQL),
    "ntile_percentiles": (ntile_percentiles, NTILE_SQL),
}


def stats_moments(spark, sf_dir):
    """Second-moment statistics (variance/stddev/correlation) computed
    from decimal-EXACT sums — native stddev/corr accumulate doubles in
    engine-specific orders and can't hash-match across engines; the
    moment formula from exact sums is bit-deterministic."""
    l = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    sx = _dsum(F.col("l_quantity"))
    sxx = _dsum(F.col("l_quantity") * F.col("l_quantity"), 8)
    sy = _dsum(F.col("l_extendedprice"))
    syy = _dsum(F.col("l_extendedprice") * F.col("l_extendedprice"), 4)
    sxy = _dsum(F.col("l_quantity") * F.col("l_extendedprice"), 6)
    var = (sxx - sx * sx / n) / (n - 1)
    vary = (syy - sy * sy / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    return (l.groupBy("l_returnflag")
             .agg(n.cast("long").alias("n"),
                  F.round(var, 6).alias("var_qty"),
                  F.round(F.sqrt(var), 6).alias("std_qty"),
                  F.round(cov / F.sqrt(var * vary), 6).alias("corr_qty_price"))
             .orderBy("l_returnflag"))


STATS_SQL = f"""
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {_osum('l_quantity')} AS sx,
         {_osum('l_quantity * l_quantity', 8)} AS sxx,
         {_osum('l_extendedprice')} AS sy,
         {_osum('l_extendedprice * l_extendedprice', 4)} AS syy,
         {_osum('l_quantity * l_extendedprice', 6)} AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
       ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty,
       ROUND((sxy - sx * sy / n) / (n - 1)
             / SQRT((sxx - sx * sx / n) / (n - 1)
                    * (syy - sy * sy / n) / (n - 1)), 6) AS corr_qty_price
FROM m ORDER BY l_returnflag
"""


def percentile_exact(spark, sf_dir):
    """Exact interpolated percentiles (PERCENTILE_CONT ≙ DuckDB
    quantile_cont — linear interpolation over the sorted set), through
    the shared CDF walk (operators/orderstats.grouped_quantile_cont).
    Round-8 rewrite away from Spark's ``percentile`` aggregate: that
    plans an ObjectHashAggregate which buffers every group's full
    value set in executor memory — with 3 order-status groups at
    100 TB that is rows/3 values on one executor's heap. The CDF walk
    pre-aggregates to distinct (status, price) counts (combinable)
    and interpolates between the two bracketing order statistics —
    same values, bounded memory."""
    from heracles_spark.operators.orderstats import grouped_quantile_cont

    o = _t(spark, sf_dir, "orders")
    q = grouped_quantile_cont(
        o.select("o_orderstatus", "o_totalprice"),
        ["o_orderstatus"], "o_totalprice",
        {"median_price": 0.5, "p90_price": 0.9}, n_col=None)
    return (q.select("o_orderstatus",
                     F.round("median_price", 4).alias("median_price"),
                     F.round("p90_price", 4).alias("p90_price"))
             .orderBy("o_orderstatus"))


PCT_SQL = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def percentile_approx_scale(spark, sf_dir):
    """Sketch percentiles (approx_percentile — Greenwald-Khanna
    summaries): the scale path (SCALE.md gap #5). Exact percentile
    collects each group's full value set; the sketch is single-pass,
    mergeable, bounded memory — the only viable shape at 100 TB.

    Oracle strategy: sketch outputs are engine-specific, so the query
    asserts the ±ε CONTRACT instead of values — per-group booleans
    "approx within 1% of exact" that a plain-SQL oracle pins to TRUE.
    The tolerance is generous vs the configured rank error (1e-4·n),
    so it holds under any partitioning (driver's vanilla session too).
    The exact side comes from the CDF walk (grouped_quantile_cont) —
    the sketch is audited against an exact path that is ITSELF scale-
    safe, not against a group-buffering percentile aggregate."""
    from heracles_spark.operators.orderstats import grouped_quantile_cont

    o = _t(spark, sf_dir, "orders")
    ap = (o.groupBy("o_orderstatus")
           .agg(F.expr("approx_percentile(o_totalprice, array(0.5, 0.9), "
                       "10000)").alias("ap")))
    ex = grouped_quantile_cont(
        o.select("o_orderstatus", "o_totalprice"),
        ["o_orderstatus"], "o_totalprice",
        {"ex50": 0.5, "ex90": 0.9}, n_col=None)
    agg = ap.join(ex, "o_orderstatus")

    def ok(i: int, ex_col: str):
        return (F.abs(F.col("ap").getItem(i) - F.col(ex_col))
                <= 0.01 * F.abs(F.col(ex_col)))

    return (agg.select("o_orderstatus",
                       ok(0, "ex50").alias("p50_within_1pct"),
                       ok(1, "ex90").alias("p90_within_1pct"))
               .orderBy("o_orderstatus"))


PAS_SQL = """
SELECT o_orderstatus, TRUE AS p50_within_1pct, TRUE AS p90_within_1pct
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES["stats_moments"] = (stats_moments, STATS_SQL)
QUERIES["percentile_exact"] = (percentile_exact, PCT_SQL)
QUERIES["percentile_approx_scale"] = (percentile_approx_scale, PAS_SQL)


# -- batch 4: correlated EXISTS, window frames, distribution ranks, skew ---

def subquery_exists(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS (decorrelated by Catalyst into
    semi/anti joins — the same plans the reference's subquery surface
    produces through stock Spark)."""
    c = _t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("_c_ex")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_o_ex")
    return spark.sql("""
        SELECT c_mktsegment,
               CAST(SUM(CASE WHEN has_urgent THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_with_urgent,
               CAST(SUM(CASE WHEN has_urgent THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_without
        FROM (
          SELECT c.c_mktsegment,
                 EXISTS(SELECT 1 FROM _o_ex o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT') AS has_urgent
          FROM _c_ex c)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")


SQE_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN has_urgent THEN 1 ELSE 0 END) AS BIGINT)
           AS n_with_urgent,
       CAST(SUM(CASE WHEN has_urgent THEN 0 ELSE 1 END) AS BIGINT)
           AS n_without
FROM (
  SELECT c.c_mktsegment,
         EXISTS(SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT') AS has_urgent
  FROM customer c) t
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


QUERIES["subquery_exists"] = (subquery_exists, SQE_SQL)


def window_first_last(spark, sf_dir):
    """first_value / last_value over an explicit full-partition frame
    (the default frame of last_value — current row — is the classic
    trap; both engines get the full frame here)."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 200)
    w = (Window.partitionBy("o_custkey")
               .orderBy("o_orderkey")
               .rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing))
    return (o.select(
                "o_custkey", "o_orderkey",
                F.first_value("o_orderkey").over(w).alias("first_order"),
                F.last_value("o_orderkey").over(w).alias("last_order"))
             .orderBy("o_custkey", "o_orderkey"))


WFL_SQL = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order
FROM orders WHERE o_custkey <= 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


QUERIES["window_first_last"] = (window_first_last, WFL_SQL)


def window_distribution_ranks(spark, sf_dir):
    """percent_rank + cume_dist (exact rational values — deterministic
    across engines, unlike ntile's remainder placement) — two-pass
    global ranks (operators.ranking), no single-partition window."""
    from heracles_spark.operators.ranking import (
        cume_dist_col, percent_rank_col, with_global_ranks)

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    ranked = with_global_ranks(o, ["o_orderkey"])
    rn, n = F.col("__rn"), F.col("__n")
    return (ranked.select(
                "o_orderkey",
                F.round(percent_rank_col(rn, n), 6).alias("pr"),
                F.round(cume_dist_col(rn, n), 6).alias("cd"))
             .orderBy("o_orderkey"))


WDR_SQL = """
SELECT o_orderkey,
       ROUND(PERCENT_RANK() OVER (ORDER BY o_orderkey), 6) AS pr,
       ROUND(CUME_DIST() OVER (ORDER BY o_orderkey), 6) AS cd
FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
"""


QUERIES["window_distribution_ranks"] = (window_distribution_ranks, WDR_SQL)


def skew_salted_distinct(spark, sf_dir):
    """Exact per-priority distinct-customer counts via value-hash
    salting (operators.skew.salted_count_distinct): the hot key's
    distinct state splits across 16 balanced buckets, summed per key —
    identical to plain COUNT(DISTINCT), which is the oracle."""
    from heracles_spark.operators.skew import salted_count_distinct

    o = _t(spark, sf_dir, "orders")
    return (salted_count_distinct(o, "o_orderpriority", "o_custkey",
                                  n_salt=16, out_col="n_customers")
            .orderBy("o_orderpriority"))


SSD_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES["skew_salted_distinct"] = (skew_salted_distinct, SSD_SQL)
