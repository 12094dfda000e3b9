"""Relational corpus, batch 4: multiset set-ops (EXCEPT/INTERSECT ALL),
regexp functions, ordered string aggregation (LISTAGG-equivalent), and
RANGE window frames — inherited Spark surface the reference never
exercised, proven against the DuckDB oracle like the rest of §2.7/§2.8.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from heracles_spark.queries.relational import _t


def set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference keeps surplus duplicates (the
    bag semantics INTERSECT/EXCEPT [DISTINCT] collapse)."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 50000).select("o_orderstatus")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus")
    return (a.exceptAll(b)
             .groupBy("o_orderstatus")
             .agg(F.count(F.lit(1)).alias("n"))
             .orderBy("o_orderstatus"))


EXA_SQL = """
SELECT o_orderstatus, COUNT(*) AS n FROM (
  SELECT o_orderstatus FROM orders WHERE o_totalprice > 50000
  EXCEPT ALL
  SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection (min of multiplicities)."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 50000).select("o_orderstatus")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus")
    return (a.intersectAll(b)
             .groupBy("o_orderstatus")
             .agg(F.count(F.lit(1)).alias("n"))
             .orderBy("o_orderstatus"))


INA_SQL = """
SELECT o_orderstatus, COUNT(*) AS n FROM (
  SELECT o_orderstatus FROM orders WHERE o_totalprice > 50000
  INTERSECT ALL
  SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def regexp_functions(spark, sf_dir):
    """regexp_extract / regexp_replace / rlike over customer + part —
    the pattern surface every text pipeline leans on (patterns chosen
    for identical semantics across engines)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 25)
    return (c.select(
                F.col("c_custkey"),
                F.regexp_extract(F.col("c_name"), r"Customer#(\d+)", 1)
                 .cast("bigint").alias("name_num"),
                F.regexp_replace(F.col("c_mktsegment"), r"[AEIOU]", "_")
                 .alias("seg_novowel"),
                F.col("c_name").rlike(r"#0+[12]?\d$").alias("low_id"))
             .orderBy("c_custkey"))


REGEX_SQL = """
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_num,
       regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_novowel,
       regexp_matches(c_name, '#0+[12]?\\d$') AS low_id
FROM customer WHERE c_custkey <= 25 ORDER BY c_custkey
"""


def string_agg_per_group(spark, sf_dir):
    """LISTAGG / string_agg equivalent: per-nation supplier roster as an
    ORDERED joined string — deterministic regardless of partitioning
    because the collected list is sorted before joining."""
    s = _t(spark, sf_dir, "supplier")
    return (s.groupBy("s_nationkey")
             .agg(F.array_join(F.array_sort(F.collect_list("s_name")), ",")
                   .alias("roster"),
                  F.count(F.lit(1)).alias("n_suppliers"))
             .orderBy("s_nationkey"))


SAGG_SQL = """
SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS roster,
       COUNT(*) AS n_suppliers
FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
"""


def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based, not row-based): for each order, revenue
    of all orders within 500 orderkeys back. Frame membership is a value
    predicate, so ties/gaps behave differently from ROWS — the half of
    the frame surface the ROWS queries don't touch. Decimal-exact sum
    keeps the hash cross-engine-stable."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    from heracles_spark.operators.ranking import range_frame_agg
    # Ghost-row chunked RANGE frame (operators.ranking.range_frame_agg)
    # instead of a single-partition global window — result-identical.
    framed = range_frame_agg(
        o.select("o_orderkey",
                 F.col("o_totalprice").cast("decimal(38,6)").alias("__v")),
        "o_orderkey", F.col("__v"), preceding=500,
        out_col="__trail")
    return (framed.select(
                "o_orderkey",
                F.col("__trail").cast("double").alias("trailing_rev"))
             .orderBy("o_orderkey"))


WRF_SQL = """
SELECT o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            OVER (ORDER BY o_orderkey
                  RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS trailing_rev
FROM orders WHERE o_custkey <= 50 ORDER BY o_orderkey
"""


QUERIES = {
    "set_except_all": (set_except_all, EXA_SQL),
    "set_intersect_all": (set_intersect_all, INA_SQL),
    "regexp_functions": (regexp_functions, REGEX_SQL),
    "string_agg_per_group": (string_agg_per_group, SAGG_SQL),
    "window_range_frame": (window_range_frame, WRF_SQL),
}


def struct_nested_access(spark, sf_dir):
    """Struct construction, nested-field access, GROUPING on a nested
    field, and nested-array indexing (≙ HBaseSQLQuerySuite.scala:52-67,
    157-181, 964-972 — struct field access & grouping on nested fields,
    array indexing incl. nested arrays). The struct/array plumbing is
    Spark-side; the oracle states the equivalent flat semantics."""
    s = _t(spark, sf_dir, "supplier")
    st = F.struct(F.col("s_nationkey").alias("nk"),
                  F.col("s_name").alias("nm"))
    nested = F.array(F.array(F.col("s_suppkey"), -F.col("s_suppkey")))
    per_row = s.select(st.alias("st"), nested.alias("arr"))
    return (per_row
            .groupBy(F.col("st.nk").alias("nk"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(F.col("st.nm")).alias("first_name"),
                 F.min(F.col("arr")[0][1]).alias("min_neg_key"))
            .orderBy("nk"))


SNA_SQL = """
SELECT s_nationkey AS nk, COUNT(*) AS n, MIN(s_name) AS first_name,
       CAST(MIN(-s_suppkey) AS BIGINT) AS min_neg_key
FROM supplier GROUP BY s_nationkey ORDER BY nk
"""


def rand_contract(spark, sf_dir):
    """rand()/randn() (≙ HBaseAdditionalQuerySuite.scala:146-151) are
    engine- and partitioning-specific, so the oracle pins their CONTRACT:
    every sample in range, count preserved — the same pattern the approx
    sketches use."""
    o = _t(spark, sf_dir, "orders")
    r = o.select(F.rand(42).alias("r"), F.randn(42).alias("rn"))
    return r.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min((F.col("r") >= 0) & (F.col("r") < 1)).alias("rand_in_range"),
        F.min(F.abs(F.col("rn")) < 8).alias("randn_sane"))


RAND_SQL = """
SELECT COUNT(*) AS n_rows, TRUE AS rand_in_range, TRUE AS randn_sane
FROM orders
"""


QUERIES["struct_nested_access"] = (struct_nested_access, SNA_SQL)
QUERIES["rand_contract"] = (rand_contract, RAND_SQL)


def cast_type_matrix(spark, sf_dir):
    """SURVEY §1.3 type-system sweep: casts across the full supported
    set (boolean/tinyint/smallint/int/bigint/float/double/decimal/
    string/date/timestamp/binary) chosen where both engines' cast
    semantics provably agree: small ints (no wrap), float32 narrowing
    (IEEE, deterministic), decimal(18,2) quantization, ISO date strings,
    hex-encoded binary. Double→int truncation is EXCLUDED by design —
    Spark truncates, DuckDB rounds."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    k = F.col("o_orderkey")
    return (o.select(
                k,
                k.cast("tinyint").alias("k_i8"),
                k.cast("smallint").alias("k_i16"),
                (k % 2 == 0).alias("k_even"),
                (k % 2 == 0).cast("int").alias("k_even_i"),
                (k % 2 == 0).cast("string").alias("k_even_s"),
                F.col("o_totalprice").cast("float").cast("double")
                 .alias("price_f32"),
                F.col("o_totalprice").cast("decimal(18,2)").cast("string")
                 .alias("price_dec_s"),
                F.col("o_orderdate").cast("date").cast("string")
                 .alias("date_s"),
                F.hex(F.encode(F.col("o_orderpriority"), "utf-8"))
                 .alias("prio_hex"))
             .orderBy("o_orderkey"))


CTM_SQL = """
SELECT o_orderkey,
       CAST(o_orderkey AS TINYINT) AS k_i8,
       CAST(o_orderkey AS SMALLINT) AS k_i16,
       o_orderkey % 2 = 0 AS k_even,
       CAST(o_orderkey % 2 = 0 AS INT) AS k_even_i,
       CAST(o_orderkey % 2 = 0 AS VARCHAR) AS k_even_s,
       CAST(CAST(o_totalprice AS FLOAT) AS DOUBLE) AS price_f32,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_s,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_s,
       hex(encode(o_orderpriority)) AS prio_hex
FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
"""


QUERIES["cast_type_matrix"] = (cast_type_matrix, CTM_SQL)


def lateral_topn_per_nation(spark, sf_dir):
    """Correlated LATERAL subquery join (SQL:1999 lateral derived table):
    top-2 suppliers by balance per nation. Spark plans this as a
    LateralJoin with the correlated limit pushed inside — the modern
    form of the top-n-per-group shape window_rank_dense also covers."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_lat")
    return spark.sql("""
        SELECT n.n_name, t.s_name, t.s_acctbal
        FROM nation_lat n,
        LATERAL (SELECT s_name, s_acctbal FROM supplier_lat s
                 WHERE s.s_nationkey = n.n_nationkey
                 ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        ORDER BY n.n_name, t.s_acctbal DESC, t.s_name
    """)


LAT_SQL = """
SELECT n.n_name, t.s_name, t.s_acctbal
FROM nation n,
LATERAL (SELECT s_name, s_acctbal FROM supplier s
         WHERE s.s_nationkey = n.n_nationkey
         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
ORDER BY n.n_name, t.s_acctbal DESC, t.s_name
"""


def interval_arithmetic(spark, sf_dir):
    """INTERVAL literal arithmetic on timestamps (day/hour/minute adds,
    timestamp differences in minutes) — naive (NTZ) end to end, so the
    values are session-timezone-independent on both engines."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir).where(F.col("event_id") <= 50)
    return (e.select(
                "event_id",
                F.col("ts"),
                F.expr("ts + INTERVAL 90 MINUTE").alias("plus90m"),
                F.expr("ts - INTERVAL 1 DAY").alias("minus1d"),
                # field extraction, not timestampdiff: the latter
                # promotes NTZ args to session-tz TIMESTAMP (DST
                # hazard; see relational._events)
                F.expr("unix_date(cast(ts as date)) * 1440"
                       " + cast(hour(ts) as bigint) * 60"
                       " + cast(minute(ts) as bigint)")
                 .alias("minutes_since_epoch"))
             .orderBy("event_id"))


IVL_SQL = """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS plus90m,
       CAST(ts AS TIMESTAMP) - INTERVAL 1 DAY AS minus1d,
       CAST(datediff('minute', TIMESTAMP '1970-01-01 00:00:00',
                     CAST(ts AS TIMESTAMP)) AS BIGINT)
         AS minutes_since_epoch
FROM events WHERE event_id <= 50 ORDER BY event_id
"""


QUERIES["lateral_topn_per_nation"] = (lateral_topn_per_nation, LAT_SQL)
QUERIES["interval_arithmetic"] = (interval_arithmetic, IVL_SQL)


def recursive_cte_spine(spark, sf_dir):
    """WITH RECURSIVE (Spark 4.x grammar): generate a month spine and
    left-join monthly order counts — the gaps-filled time series every
    reporting pipeline needs (months with zero orders appear). The
    recursion is bounded (driver-checkable termination) and identical
    SQL runs on both engines."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec")
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01' AS m
          UNION ALL
          SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
          WHERE m < DATE '1996-12-01')
        SELECT CAST(months.m AS STRING) AS month,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM months LEFT JOIN orders_rec o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
        GROUP BY months.m ORDER BY month
    """)


REC_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1995-01-01' AS m
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < DATE '1996-12-01')
SELECT strftime(months.m, '%Y-%m-%d') AS month,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM months LEFT JOIN orders o
  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
GROUP BY months.m ORDER BY month
"""


def map_functions(spark, sf_dir):
    """Map-typed column plumbing: build a map per row, extract by key,
    size it, null on missing key — scalar outputs so the oracle states
    flat semantics while Spark exercises the MapType path."""
    n = _t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nk"), F.col("n_nationkey").cast("long"),
        F.lit("rk"), F.col("n_regionkey").cast("long"))
    return (n.select(
                "n_name",
                F.element_at(m, "nk").alias("from_map_nk"),
                F.element_at(m, "rk").alias("from_map_rk"),
                F.size(m).alias("map_size"),
                F.element_at(m, "missing").alias("absent"))
             .orderBy("n_name"))


MAPF_SQL = """
SELECT n_name, CAST(n_nationkey AS BIGINT) AS from_map_nk,
       CAST(n_regionkey AS BIGINT) AS from_map_rk,
       2 AS map_size, CAST(NULL AS BIGINT) AS absent
FROM nation ORDER BY n_name
"""


QUERIES["recursive_cte_spine"] = (recursive_cte_spine, REC_SQL)
QUERIES["map_functions"] = (map_functions, MAPF_SQL)


def events_funnel(spark, sf_dir):
    """Funnel / sequential-pattern analysis: per user, the first click
    and the first purchase AFTER that click within 24h — conversion
    counting, the workhorse of product analytics. One aggregation for
    first-click, one conditional join + aggregation for the conversion
    leg; both shuffle on user_id and co-partition."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    clicks = (e.where(F.col("event_type") == "click")
               .groupBy("user_id")
               .agg(F.min("ts_ns").alias("first_click_ns")))
    purchases = e.where(F.col("event_type") == "purchase") \
                 .select("user_id", F.col("ts_ns").alias("p_ns"))
    conv = (clicks.join(purchases, "user_id", "left")
                  .withColumn("ok",
                              F.col("p_ns").isNotNull()
                              & (F.col("p_ns") >= F.col("first_click_ns"))
                              & (F.col("p_ns") - F.col("first_click_ns")
                                 <= 24 * 3600 * 1_000_000_000))
                  .groupBy("user_id")
                  .agg(F.max(F.col("ok").cast("int")).alias("converted")))
    return conv.agg(
        F.count(F.lit(1)).alias("n_users_clicked"),
        F.sum("converted").cast("bigint").alias("n_converted"))


FUNNEL_SQL = """
WITH clicks AS (
  SELECT user_id, MIN(epoch_ns(ts)) AS first_click_ns
  FROM events WHERE event_type = 'click' GROUP BY user_id),
 conv AS (
  SELECT c.user_id,
         MAX(CASE WHEN p.user_id IS NOT NULL
                   AND epoch_ns(p.ts) >= c.first_click_ns
                   AND epoch_ns(p.ts) - c.first_click_ns
                       <= CAST(86400 AS BIGINT) * 1000000000
              THEN 1 ELSE 0 END) AS converted
  FROM clicks c LEFT JOIN events p
    ON p.user_id = c.user_id AND p.event_type = 'purchase'
  GROUP BY c.user_id)
SELECT COUNT(*) AS n_users_clicked,
       CAST(SUM(converted) AS BIGINT) AS n_converted
FROM conv
"""


QUERIES["events_funnel"] = (events_funnel, FUNNEL_SQL)


def events_cohort_retention(spark, sf_dir):
    """Cohort retention: users cohorted by first-activity day, counted
    by how many days later they return — the triangle matrix every
    growth dashboard starts from. Two aggregations + one co-partitioned
    join on user_id; the output is O(cohorts × offsets), tiny at any
    input scale."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    day = F.to_date(F.col("ts"))
    acts = e.select("user_id", day.alias("d")).distinct()
    cohort = acts.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (acts.join(cohort, "user_id")
                .withColumn("offset_days",
                            F.datediff(F.col("d"), F.col("cohort_day")))
                .where(F.col("offset_days") <= 7)
                .groupBy("cohort_day", "offset_days")
                .agg(F.countDistinct("user_id").alias("n_users"))
                .withColumn("cohort_day",
                            F.col("cohort_day").cast("string"))
                .orderBy("cohort_day", "offset_days"))


COHORT_SQL = """
WITH acts AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
 cohort AS (
  SELECT user_id, MIN(d) AS cohort_day FROM acts GROUP BY user_id)
SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
       CAST(datediff('day', c.cohort_day, a.d) AS INT) AS offset_days,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM acts a JOIN cohort c USING (user_id)
WHERE datediff('day', c.cohort_day, a.d) <= 7
GROUP BY 1, 2 ORDER BY cohort_day, offset_days
"""


QUERIES["events_cohort_retention"] = (events_cohort_retention, COHORT_SQL)


def conditional_functions(spark, sf_dir):
    """Conditional scalar batch: nullif / ifnull / coalesce chains /
    nvl2-equivalent / greatest-least null behavior — the null-plumbing
    functions §2.8's CASE/COALESCE queries don't isolate."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 30)
    bal = F.col("c_acctbal")
    return (c.select(
                "c_custkey",
                F.nullif(F.col("c_nationkey"), F.lit(3)).alias("nk_not3"),
                F.ifnull(F.nullif(F.col("c_nationkey"), F.lit(3)),
                         F.lit(-1)).alias("nk_or_neg1"),
                F.coalesce(F.nullif(bal, bal), bal, F.lit(0.0))
                 .alias("bal_coalesced"),
                F.when(F.col("c_mktsegment").isNotNull(), F.lit("seg"))
                 .otherwise(F.lit("noseg")).alias("nvl2_equiv"),
                F.greatest(F.lit(None).cast("double"), bal)
                 .alias("greatest_with_null"))
             .orderBy("c_custkey"))


CONDF_SQL = """
SELECT c_custkey,
       nullif(c_nationkey, 3) AS nk_not3,
       ifnull(nullif(c_nationkey, 3), -1) AS nk_or_neg1,
       coalesce(nullif(c_acctbal, c_acctbal), c_acctbal, 0.0)
         AS bal_coalesced,
       CASE WHEN c_mktsegment IS NOT NULL THEN 'seg' ELSE 'noseg' END
         AS nvl2_equiv,
       greatest(CAST(NULL AS DOUBLE), c_acctbal) AS greatest_with_null
FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey
"""


QUERIES["conditional_functions"] = (conditional_functions, CONDF_SQL)


def string_functions3(spark, sf_dir):
    """String batch 3: split_part / reverse / repeat / lpad / rpad /
    translate / position / left-right slices — the remaining §2.8
    string surface both engines implement identically."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 25)
    nm = F.col("c_name")
    return (c.select(
                "c_custkey",
                F.split_part(nm, F.lit("#"), F.lit(2)).alias("num_part"),
                F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
                F.repeat(F.lit("ab"), 3).alias("abx3"),
                F.lpad(F.col("c_custkey").cast("string"), 6, "0")
                 .alias("key_lpad"),
                F.rpad(F.col("c_mktsegment"), 12, ".").alias("seg_rpad"),
                F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou")
                 .alias("seg_lower_vowels"),
                F.instr(nm, F.lit("#")).alias("hash_pos"),
                F.substring(nm, 1, 8).alias("left8"),
                nm.substr(F.length(nm) - 3, F.lit(4)).alias("right4"))
             .orderBy("c_custkey"))


STRF3_SQL = """
SELECT c_custkey,
       split_part(c_name, '#', 2) AS num_part,
       reverse(c_mktsegment) AS seg_rev,
       repeat('ab', 3) AS abx3,
       lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS key_lpad,
       rpad(c_mktsegment, 12, '.') AS seg_rpad,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       CAST(position('#' IN c_name) AS INT) AS hash_pos,
       substring(c_name, 1, 8) AS left8,
       substring(c_name, length(c_name) - 3, 4) AS right4
FROM customer WHERE c_custkey <= 25 ORDER BY c_custkey
"""


QUERIES["string_functions3"] = (string_functions3, STRF3_SQL)


def lineitem_skew_join(spark, sf_dir):
    """Planted-skew join handled by explicit salting
    (operators.skew.salted_join): 3/4 of lineitem collapses onto hot
    key 0, which would put ~450k rows in ONE join task at any scale —
    the classic hot-key failure AQE's skew splitting mitigates for
    sort-merge joins and salting solves deterministically for any
    strategy. The big side is salted 8 ways (deterministic xxhash64
    row salt), the small side replicated 8×, so the hot key spreads
    over 8 tasks. ``salted`` is pinned TRUE by the oracle: it certifies
    the physical join really ran on (k, __salt__) — the value hash
    fails if the salt disappeared from the plan."""
    from heracles_spark.operators.skew import salted_join
    from heracles_spark.plans.inspect import executed_plan_string

    skew_k = (F.when(F.col("l_orderkey") % 4 != 0, F.lit(0))
               .otherwise(F.col("l_orderkey"))).alias("k")
    big = _t(spark, sf_dir, "lineitem").select(skew_k, "l_quantity")
    o_k = (F.when(F.col("o_orderkey") % 4 != 0, F.lit(0))
            .otherwise(F.col("o_orderkey"))).alias("k")
    small = (_t(spark, sf_dir, "orders").select(o_k, "o_orderpriority")
             .groupBy("k")
             .agg(F.min("o_orderpriority").alias("prio")))
    joined = salted_join(big, small, on="k", n_salt=8)
    agg = (joined.groupBy("prio")
                 .agg(F.count(F.lit(1)).alias("n_lines"),
                      F.sum(F.round(F.col("l_quantity") * 100)
                             .cast("long")).alias("qty_cents")))
    salted = "__salt__" in executed_plan_string(agg, "simple")
    return (agg.select("prio",
                       "n_lines",
                       (F.col("qty_cents").cast("double") / 100.0)
                       .alias("sum_qty"),
                       F.lit(salted).alias("salted"))
               .orderBy("prio"))


SKEWJ_SQL = """
WITH big AS (
  SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0 ELSE l_orderkey END AS k,
         l_quantity
  FROM lineitem),
 small AS (
  SELECT CASE WHEN o_orderkey % 4 <> 0 THEN 0 ELSE o_orderkey END AS k,
         MIN(o_orderpriority) AS prio
  FROM orders GROUP BY 1)
SELECT prio, COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
            / 100.0 AS DOUBLE) AS sum_qty,
       TRUE AS salted
FROM big JOIN small USING (k)
GROUP BY prio ORDER BY prio
"""


QUERIES["lineitem_skew_join"] = (lineitem_skew_join, SKEWJ_SQL)


def pivot_returnflag_status(spark, sf_dir):
    """PIVOT — revenue cross-tab (l_returnflag × l_linestatus) via
    groupBy().pivot() with EXPLICIT value list: declared pivot values
    skip Spark's extra distinct-collect job AND fix the output column
    set at plan time (schema-stable on any data slice — the form a
    100 TB job should always use). Decimal-exact sums, double output."""
    from heracles_spark.queries.relational import _dsum, _t

    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    piv = (li.withColumn("__rev", rev)
             .groupBy("l_returnflag")
             .pivot("l_linestatus", ["F", "O"])
             .agg(_dsum(F.col("__rev")))
             .orderBy("l_returnflag"))
    # ROUND(…, 2) on the double output (round-11 sf10 finding): the
    # exact decimal sums are identical across engines, but DuckDB's
    # decimal→double cast came out ONE ULP below the correctly-rounded
    # double at ~5e11 magnitude (503968667876.770000 → …76.76996 vs
    # Spark's …76.77); rounding to the cents the data actually carries
    # absorbs the engine's cast quirk on both sides.
    return piv.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("rev_f"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("rev_o"))


PIVOT_SQL = """
SELECT l_returnflag,
       ROUND(COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'F'
           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
           END) AS DOUBLE), 0.0), 2) AS rev_f,
       ROUND(COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'O'
           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
           END) AS DOUBLE), 0.0), 2) AS rev_o
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES["pivot_returnflag_status"] = (pivot_returnflag_status, PIVOT_SQL)


def unpivot_order_measures(spark, sf_dir):
    """UNPIVOT (melt) — wide measure columns back to (key, measure,
    value) rows via DataFrame.unpivot (plans as a single Expand node:
    one pass, rows×measures output, no join/union of per-measure
    scans). Aggregated per measure for a stable driver check."""
    from heracles_spark.queries.relational import _dsum, _t

    o = _t(spark, sf_dir, "orders")
    wide = o.select("o_orderkey",
                    F.col("o_totalprice").alias("totalprice"),
                    F.col("o_custkey").cast("double").alias("custkey"))
    long = wide.unpivot("o_orderkey", ["totalprice", "custkey"],
                        "measure", "value")
    return (long.groupBy("measure")
                .agg(F.count(F.lit(1)).alias("n"),
                     _dsum(F.col("value")).alias("total"))
                .orderBy("measure"))


UNPIVOT_SQL = """
SELECT measure, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM (
  SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey' AS measure,
         CAST(o_custkey AS DOUBLE) AS value
  FROM orders)
GROUP BY measure ORDER BY measure
"""


QUERIES["unpivot_order_measures"] = (unpivot_order_measures, UNPIVOT_SQL)


def lineitem_quantile_disc(spark, sf_dir):
    """EXACT discrete percentiles (PERCENTILE_DISC semantics: smallest
    value whose cume_dist ≥ p, i.e. the element at rank ⌈p·n⌉): order
    statistics, so the result is an actual data element —
    engine-identical by construction, no interpolation arithmetic to
    diverge (the approx variant with its error contract is
    percentile_approx_scale).

    Deliberately NOT Spark's percentile_disc aggregate: that plans as
    an ObjectHashAggregate which BUFFERS every group's values in
    executor memory — a billion-row group at 100 TB is an OOM, the
    same class of hazard as an unpartitioned window. This form is the
    shared integer CDF walk (operators/orderstats): raw rows collapse
    to distinct (flag, price) counts via a combinable hash aggregate,
    the keyed cumsum window runs over DISTINCT values only, and the
    quantile is the first value whose cumulative count reaches ⌈p·n⌉
    — per-task work O(|distinct prices|), not O(rows per group)
    (round-8 rewrite of the raw-row row_number form, which sorted
    every row of a group in one task)."""
    from heracles_spark.operators.orderstats import (
        grouped_quantile_disc, parquet_footer_bounds)

    li = _t(spark, sf_dir, "lineitem")
    # Round-13 (guide §6): global value bounds read driver-side from
    # the parquet footers — metadata the scan's own files carry —
    # remove the per-group bounds pass over the distinct-value
    # relation from the plan. Exactness never depends on the hint
    # (grouped_cdf clamps buckets; A/B asserted identical rows).
    return (grouped_quantile_disc(
                li.select("l_returnflag", "l_extendedprice"),
                ["l_returnflag"], "l_extendedprice",
                {"p25": 0.25, "p50": 0.5, "p75": 0.75},
                bounds_hint=parquet_footer_bounds(
                    f"{sf_dir}/lineitem.parquet", "l_extendedprice"))
            .orderBy("l_returnflag"))


def lineitem_percentile_cont(spark, sf_dir):
    """Exact INTERPOLATED percentiles over the big table
    (PERCENTILE_CONT semantics — row rank 1 + p·(n−1), linear
    interpolation between the bracketing order statistics) via the
    shared CDF walk (operators/orderstats.grouped_quantile_cont).
    Unlike percentile_exact (orders table, Spark's ``percentile``
    aggregate), this shape never buffers a group's values in executor
    memory: the combinable (flag, price) pre-aggregation does the
    100 TB-of-rows reduction, the keyed cumsum window touches distinct
    values only, and interpolation is a 3-row select. Oracle computes
    the IDENTICAL expression (same operation order) from the same
    cumulative counts."""
    from heracles_spark.operators.orderstats import (
        grouped_quantile_cont, parquet_footer_bounds)

    li = _t(spark, sf_dir, "lineitem")
    # Footer-bounds hint: see lineitem_quantile_disc (guide §6).
    q = grouped_quantile_cont(
        li.select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"], "l_extendedprice",
        {"p50": 0.5, "p95": 0.95},
        bounds_hint=parquet_footer_bounds(
            f"{sf_dir}/lineitem.parquet", "l_extendedprice"))
    return (q.select("l_returnflag", "n",
                     F.round("p50", 4).alias("p50"),
                     F.round("p95", 4).alias("p95"))
             .orderBy("l_returnflag"))


PCONT_SQL = """
WITH g AS (
  SELECT l_returnflag, l_extendedprice AS v, COUNT(*) AS w
  FROM lineitem GROUP BY 1, 2),
 c AS (
  SELECT l_returnflag, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM g),
 pick AS (
  SELECT l_returnflag, MAX(tot) AS n,
         MIN(CASE WHEN cum >= FLOOR(1.0 + 0.5  * (tot - 1)) THEN v END)
           AS lo50,
         MIN(CASE WHEN cum >= CEIL (1.0 + 0.5  * (tot - 1)) THEN v END)
           AS hi50,
         MIN(CASE WHEN cum >= FLOOR(1.0 + 0.95 * (tot - 1)) THEN v END)
           AS lo95,
         MIN(CASE WHEN cum >= CEIL (1.0 + 0.95 * (tot - 1)) THEN v END)
           AS hi95
  FROM c GROUP BY 1)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND(lo50 + (1.0 + 0.5  * (CAST(n AS DOUBLE) - 1.0)
                     - FLOOR(1.0 + 0.5  * (CAST(n AS DOUBLE) - 1.0)))
                    * (hi50 - lo50), 4) AS p50,
       ROUND(lo95 + (1.0 + 0.95 * (CAST(n AS DOUBLE) - 1.0)
                     - FLOOR(1.0 + 0.95 * (CAST(n AS DOUBLE) - 1.0)))
                    * (hi95 - lo95), 4) AS p95
FROM pick ORDER BY l_returnflag
"""


QUERIES["lineitem_percentile_cont"] = (lineitem_percentile_cont,
                                       PCONT_SQL)


QDISC_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         CUME_DIST() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice) AS cd
  FROM lineitem),
 q AS (
  SELECT l_returnflag,
         MIN(CASE WHEN cd >= 0.25 THEN l_extendedprice END) AS p25,
         MIN(CASE WHEN cd >= 0.5  THEN l_extendedprice END) AS p50,
         MIN(CASE WHEN cd >= 0.75 THEN l_extendedprice END) AS p75
  FROM ranked GROUP BY l_returnflag),
 n AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem
       GROUP BY l_returnflag)
SELECT n.l_returnflag, n.n, q.p25, q.p50, q.p75
FROM n JOIN q USING (l_returnflag) ORDER BY l_returnflag
"""


QUERIES["lineitem_quantile_disc"] = (lineitem_quantile_disc, QDISC_SQL)


def lineitem_equidepth_hist(spark, sf_dir):
    """Equi-depth histogram of l_extendedprice per (returnflag, linestatus) cell — the
    cost-based-optimizer statistic (Spark's own ANALYZE TABLE … FOR
    COLUMNS keeps exactly this shape), computed EXACTLY through the
    shared CDF walk (operators/orderstats.grouped_equidepth_histogram):
    raw rows collapse to distinct (flag, status, price) counts, the bucketed
    cumsum assigns each distinct value its depth bucket via the pure
    integer ``(cum·k + tot − 1) div tot``, and one more combinable
    aggregate emits each bucket's upper boundary / row weight /
    distinct-value count. No group is ever buffered and no raw-row
    sort exists — the statistics pass itself follows the engine's
    100 TB order-statistics discipline."""
    from heracles_spark.operators.orderstats import (
        grouped_equidepth_histogram, parquet_footer_bounds)

    li = _t(spark, sf_dir, "lineitem")
    # Footer-bounds hint: see lineitem_quantile_disc (guide §6).
    return (grouped_equidepth_histogram(
                li.select("l_returnflag", "l_linestatus",
                          "l_extendedprice"),
                ["l_returnflag", "l_linestatus"], "l_extendedprice", 8,
                bounds_hint=parquet_footer_bounds(
                    f"{sf_dir}/lineitem.parquet", "l_extendedprice"))
            .orderBy("l_returnflag", "l_linestatus", "bucket"))


EQDEPTH_SQL = """
WITH g AS (
  SELECT l_returnflag, l_linestatus, l_extendedprice AS v, COUNT(*) AS w
  FROM lineitem GROUP BY 1, 2, 3),
 c AS (
  SELECT l_returnflag, l_linestatus, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot
  FROM g)
SELECT l_returnflag, l_linestatus,
       CAST((cum * 8 + tot - 1) // tot AS INT) AS bucket,
       MAX(v) AS hi, CAST(SUM(w) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_values
FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


QUERIES["lineitem_equidepth_hist"] = (lineitem_equidepth_hist,
                                      EQDEPTH_SQL)


def cube_status_priority(spark, sf_dir):
    """GROUP BY CUBE — all 4 grouping sets of (status, priority) in one
    pass (a single Expand node feeding one hash agg, NOT 4 scans);
    grouping_id disambiguates rolled-up NULLs from data NULLs, rolled
    dims surface as 'ALL'. Decimal-exact revenue."""
    from heracles_spark.queries.relational import _dsum

    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"),
                  _dsum(F.col("o_totalprice")).alias("revenue"),
                  F.grouping_id().alias("gid"))
             .select(F.coalesce("o_orderstatus", F.lit("ALL"))
                      .alias("status"),
                     F.coalesce("o_orderpriority", F.lit("ALL"))
                      .alias("priority"),
                     "gid", "n", "revenue")
             .orderBy("gid", "status", "priority"))


CUBE_SQL = """
WITH g0 AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         0 AS gid, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1, 2),
 g1 AS (
  SELECT o_orderstatus AS status, 'ALL' AS priority, 1 AS gid,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1),
 g2 AS (
  SELECT 'ALL' AS status, o_orderpriority AS priority, 2 AS gid,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 2),
 g3 AS (
  SELECT 'ALL' AS status, 'ALL' AS priority, 3 AS gid, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS revenue
  FROM orders)
SELECT status, priority, gid, n, revenue
FROM (SELECT * FROM g0 UNION ALL SELECT * FROM g1
      UNION ALL SELECT * FROM g2 UNION ALL SELECT * FROM g3)
ORDER BY gid, status, priority
"""


QUERIES["cube_status_priority"] = (cube_status_priority, CUBE_SQL)


def part_affinity_lift(spark, sf_dir):
    """Market-basket affinity: part pairs co-occurring in the same
    order, with LIFT = n_pair·N / (n_a·n_b) — the classic co-purchase
    score. The pair join is keyed on o_orderkey, so the blow-up is
    bounded by per-order line counts (~4 in TPC-H), never all-pairs
    over the catalog; lift is one rational expression (exact integer
    operands, one division, rounded). Top 15 pairs with ≥2 co-orders
    by (lift DESC, part_a, part_b)."""
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    n_orders = li.select("l_orderkey").distinct() \
                 .agg(F.count(F.lit(1)).alias("n_orders"))
    per_part = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (a.join(b, "l_orderkey")
              .where(F.col("part_a") < F.col("part_b"))
              .groupBy("part_a", "part_b")
              .agg(F.count(F.lit(1)).alias("n_pair"))
              .where(F.col("n_pair") >= 2))
    return (pairs
            .join(per_part.select(F.col("l_partkey").alias("part_a"),
                                  F.col("n").alias("n_a")), "part_a")
            .join(per_part.select(F.col("l_partkey").alias("part_b"),
                                  F.col("n").alias("n_b")), "part_b")
            .crossJoin(F.broadcast(n_orders))
            .select("part_a", "part_b", "n_pair",
                    F.round(F.col("n_pair").cast("double")
                            * F.col("n_orders")
                            / (F.col("n_a") * F.col("n_b")), 6)
                     .alias("lift"))
            .orderBy(F.desc("lift"), "part_a", "part_b")
            .limit(15))


AFFINITY_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
 n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
 pp AS (SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY l_partkey),
 pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS n_pair
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT p.part_a, p.part_b, p.n_pair,
       ROUND(CAST(p.n_pair AS DOUBLE) * n.n_orders
             / (pa.n * pb.n), 6) AS lift
FROM pairs p JOIN pp pa ON p.part_a = pa.l_partkey
             JOIN pp pb ON p.part_b = pb.l_partkey, n
ORDER BY lift DESC, part_a, part_b LIMIT 15
"""


QUERIES["part_affinity_lift"] = (part_affinity_lift, AFFINITY_SQL)


def part_abc_classification(spark, sf_dir):
    """Pareto / ABC inventory classification: parts ranked by revenue,
    INCLUSIVE cumulative revenue share, class A ≤ 70% of revenue,
    B ≤ 90%, else C. The global ordered cumsum runs through
    ranking.with_global_ordered_cumsum — value-range buckets + per-
    bucket window + broadcast offsets, never a single-partition window
    over the part catalog (millions of parts at 100 TB). Decimal
    revenue end-to-end; share = ONE double division, so class
    boundaries are engine-exact. Per-class counts + revenue."""
    from heracles_spark.operators.ranking import with_global_ordered_cumsum

    li = _t(spark, sf_dir, "lineitem")
    rev = (li.groupBy("l_partkey")
             .agg(F.sum((F.col("l_extendedprice")
                         * (1 - F.col("l_discount")))
                        .cast("decimal(38,6)")).alias("rev")))
    total = rev.agg(F.sum("rev").alias("tot"))
    cum = with_global_ordered_cumsum(
        rev.withColumn("__r", F.col("rev").cast("double")),
        ["__r", "l_partkey"], F.col("rev"),
        out_col="cum_rev", descending=True)
    share = (F.col("cum_rev").cast("double")
             / F.col("tot").cast("double"))
    classed = (cum.crossJoin(F.broadcast(total))
                  .withColumn("abc",
                              F.when(share <= 0.7, "A")
                               .when(share <= 0.9, "B")
                               .otherwise("C")))
    return (classed.groupBy("abc")
                   .agg(F.count(F.lit(1)).alias("n_parts"),
                        F.sum("rev").cast("double").alias("class_rev"))
                   .orderBy("abc"))


ABC_SQL = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(38,6))) AS rev
  FROM lineitem GROUP BY l_partkey),
 tot AS (SELECT SUM(rev) AS tot FROM rev),
 cum AS (
  SELECT l_partkey, rev,
         SUM(rev) OVER (ORDER BY CAST(rev AS DOUBLE) DESC, l_partkey DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_rev
  FROM rev),
 classed AS (
  SELECT rev,
         CASE WHEN CAST(cum_rev AS DOUBLE) / CAST(tot.tot AS DOUBLE)
                   <= 0.7 THEN 'A'
              WHEN CAST(cum_rev AS DOUBLE) / CAST(tot.tot AS DOUBLE)
                   <= 0.9 THEN 'B'
              ELSE 'C' END AS abc
  FROM cum, tot)
SELECT abc, COUNT(*) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS class_rev
FROM classed GROUP BY abc ORDER BY abc
"""


QUERIES["part_abc_classification"] = (part_abc_classification, ABC_SQL)


def orders_lead_time_stats(spark, sf_dir):
    """Order→ship lead time per order priority: mean (decimal-exact)
    and EXACT median days between o_orderdate and l_shipdate — the
    fulfillment-latency summary. Median via the shared CDF walk
    (operators/orderstats.grouped_median, round-8 rewrite of the
    rank-⌈n/2⌉ raw-row window): lead-time days have a tiny distinct
    domain (hundreds of values), so the keyed cumsum touches almost
    nothing after the combinable (priority, lead) count; datediff is
    integer-exact on both engines."""
    from heracles_spark.operators.orderstats import grouped_median

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = (li.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                 li.l_orderkey == F.col("o_orderkey"))
           .select("o_orderpriority",
                   F.datediff(F.col("l_shipdate").cast("date"),
                              F.col("o_orderdate").cast("date"))
                    .alias("lead")))
    counts = (j.groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n"),
                    (F.sum(F.col("lead").cast("decimal(38,0)"))
                      .cast("double") / F.count(F.lit(1)))
                    .alias("mean_lead")))
    med = grouped_median(j, ["o_orderpriority"], "lead",
                         out_col="median_lead")
    return (counts.join(med, "o_orderpriority")
                  .select("o_orderpriority", "n",
                          F.round("mean_lead", 6).alias("mean_lead"),
                          "median_lead")
                  .orderBy("o_orderpriority"))


LEADTIME_SQL = """
WITH j AS (
  SELECT o.o_orderpriority, l.l_orderkey, l.l_linenumber,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS lead
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
 counts AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(lead AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)
           AS mean_lead
  FROM j GROUP BY o_orderpriority),
 ranked AS (
  SELECT o_orderpriority, lead,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY lead, l_orderkey, l_linenumber)
           AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM j),
 med AS (
  SELECT o_orderpriority, lead AS median_lead FROM ranked
  WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT))
SELECT c.o_orderpriority, c.n, ROUND(c.mean_lead, 6) AS mean_lead,
       m.median_lead
FROM counts c JOIN med m USING (o_orderpriority)
ORDER BY o_orderpriority
"""


QUERIES["orders_lead_time_stats"] = (orders_lead_time_stats,
                                     LEADTIME_SQL)


def lineitem_return_rate_ci(spark, sf_dir):
    """Return-rate per order priority with 95% WILSON score interval —
    the dashboard-grade proportion estimate (well-behaved at extreme
    rates, unlike the normal approximation). Engine-exact: counts are
    integers, and the interval is a FIXED sequence of correctly-rounded
    double ops (+, *, /, sqrt — sqrt IS correctly rounded per IEEE-754,
    which is why Wilson is hash-safe where log-based intervals are
    not)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = (li.join(o.select("o_orderkey", "o_orderpriority"),
                 li.l_orderkey == F.col("o_orderkey")))
    agg = (j.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum((F.col("l_returnflag") == "R").cast("long"))
                  .alias("r")))
    z2 = 3.8416   # literal, matching the oracle's constant exactly
    n = F.col("n").cast("double")
    p = F.col("r").cast("double") / n
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (F.lit(1.96) * F.sqrt(p * (1.0 - p) / n
                                 + z2 / (4.0 * n * n)) / denom)
    return (agg.select("o_orderpriority", "n", "r",
                       F.round(p, 6).alias("rate"),
                       F.round(center - half, 6).alias("ci_lo"),
                       F.round(center + half, 6).alias("ci_hi"))
               .orderBy("o_orderpriority"))


WILSON_SQL = """
WITH agg AS (
  SELECT o.o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderpriority)
SELECT o_orderpriority, n, r,
       ROUND(CAST(r AS DOUBLE) / n, 6) AS rate,
       ROUND(((CAST(r AS DOUBLE) / n) + 3.8416 / (2.0 * n))
             / (1.0 + 3.8416 / n)
             - 1.96 * SQRT((CAST(r AS DOUBLE) / n)
                           * (1.0 - CAST(r AS DOUBLE) / n) / n
                           + 3.8416 / (4.0 * n * n))
               / (1.0 + 3.8416 / n), 6) AS ci_lo,
       ROUND(((CAST(r AS DOUBLE) / n) + 3.8416 / (2.0 * n))
             / (1.0 + 3.8416 / n)
             + 1.96 * SQRT((CAST(r AS DOUBLE) / n)
                           * (1.0 - CAST(r AS DOUBLE) / n) / n
                           + 3.8416 / (4.0 * n * n))
               / (1.0 + 3.8416 / n), 6) AS ci_hi
FROM agg ORDER BY o_orderpriority
"""


QUERIES["lineitem_return_rate_ci"] = (lineitem_return_rate_ci,
                                      WILSON_SQL)
