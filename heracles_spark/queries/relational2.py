"""Relational corpus, batch 2 — remaining TPC-H query shapes adapted to
the testdata star schema, plus scalar-function coverage (string / math /
date / JSON). Same determinism contract as relational.py (_dsum/_osum
decimal-exact sums; libm-divergent functions like exp/ln deliberately
excluded from oracles — sqrt IS correctly-rounded per IEEE on both
engines)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from heracles_spark.queries.relational import (
    _t, _dsum, _davg, _osum, _oavg, _fsum, _osum8, fast_exact_agg)


def q2_top_supplier_per_nation(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier → here max-acctbal supplier per
    nation via window rank — no partsupp table in the testdata)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (s.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") == 1)
             .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
             .select("n_name", "s_suppkey", "s_name", "s_acctbal")
             .orderBy("n_name"))


Q2_SQL = """
SELECT n_name, s_suppkey, s_name, s_acctbal FROM (
  SELECT s.*, ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                 ORDER BY s_acctbal DESC, s_suppkey) AS rk
  FROM supplier s) s
JOIN nation ON s_nationkey = n_nationkey
WHERE rk = 1 ORDER BY n_name
"""


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-filtered priority counts."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (o.join(l.select("l_orderkey").distinct(),
                   o.o_orderkey == F.col("l_orderkey"), "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("order_count"))
             .orderBy("o_orderpriority"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue between two nations by year."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | \
           ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n1), s.s_nationkey == F.col("sk"))
             .join(F.broadcast(n2), c.c_nationkey == F.col("ck"))
             .where(pair)
             .groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
             .agg(_dsum(rev, 8).alias("revenue"))
             .orderBy("supp_nation", "cust_nation", "l_year"))


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {_osum('l_extendedprice * (1 - l_discount)', 8)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's revenue share per year (conditional
    aggregation ratio, decimal-exact numerator and denominator)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    brazil_rev = F.when(F.col("n_name") == "NATION_5", rev).otherwise(F.lit(0.0))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .groupBy(F.year("o_orderdate").alias("o_year"))
             .agg((_dsum(brazil_rev, 8) / _dsum(rev, 8)).alias("mkt_share"))
             .orderBy("o_year"))


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {_osum("CASE WHEN n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 8)}
       / {_osum('l_extendedprice * (1 - l_discount)', 8)} AS mkt_share
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY o_year
"""


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on name-matched parts by nation & year."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%a%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * 0.01)
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .withColumn("nation", F.col("n_name"))
             .withColumn("o_year", F.year("o_orderdate"))
             # nation x year groups grow with SF -> two-level refold
             .transform(lambda j: fast_exact_agg(
                 j, ["nation", "o_year"],
                 sums=[("sum_profit", profit, 2)]))
             .orderBy("nation", F.desc("o_year")))


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {_osum8('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01')} AS sum_profit
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q12_priority_by_year(spark, sf_dir):
    """TPC-H Q12 shape: conditional counts (high/low priority) per year."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    low = F.when(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .groupBy(F.year("l_shipdate").alias("ship_year"))
             .agg(F.sum(high).alias("high_line_count"),
                  F.sum(low).alias("low_line_count"))
             .orderBy("ship_year"))


Q12_SQL = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY ship_year
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue percentage (BRASS parts here)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .agg((F.lit(100.0) * _dsum(promo, 8) / _dsum(rev, 8))
                  .alias("promo_revenue_pct")))


Q14_SQL = f"""
SELECT 100.0 * {_osum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 8)}
       / {_osum('l_extendedprice * (1 - l_discount)', 8)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier counts per (brand, size) with a
    NOT-IN brand exclusion."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(~F.col("p_brand").isin("Brand#1"))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .groupBy("p_brand", "p_size")
             .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
             .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
             .limit(20))


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT IN ('Brand#1')
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 20
"""


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds a threshold (aggregate-then-semi-join)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (l.groupBy("l_orderkey")
            # per-order group: bounded size -> single-level long path
            .agg(_fsum(F.col("l_quantity")).alias("total_qty"))
            .where(F.col("total_qty") > 150))
    return (o.join(big, o.o_orderkey == big.l_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .select("c_custkey", "c_name", "o_orderkey", "o_totalprice",
                     "total_qty")
             .orderBy(F.desc("total_qty"), "o_orderkey")
             .limit(20))


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, {_osum8('l_quantity')} AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING {_osum8('l_quantity')} > 150) b
  ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT 20
"""


def q19_or_of_ands(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive range predicates —
    exercises the pushdown classifier's OR algebra (≙ ScanPredClassifier
    16-case table, ScanPredClassifier.scala:27-143)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
             & (F.col("l_quantity").between(1, 21))) |
            ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
             & (F.col("l_quantity").between(10, 30))) |
            ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
             & (F.col("l_quantity").between(20, 40))))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .where(cond)
             .agg(_dsum(rev, 8).alias("revenue"),
                  F.count(F.lit(1)).alias("n_lines")))


Q19_SQL = f"""
SELECT {_osum('l_extendedprice * (1 - l_discount)', 8)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    bucketed by a name-derived code (substring grouping + anti join +
    scalar subquery)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        _davg(F.col("c_acctbal")).alias("ab"))
    code = F.substring(F.col("c_name"), -1, 1)
    return (c.join(F.broadcast(avg_bal))
             .where(F.col("c_acctbal") > F.col("ab"))
             .join(o, c.c_custkey == o.o_custkey, "left_anti")
             .groupBy(code.alias("cntrycode"))
             .agg(F.count(F.lit(1)).alias("numcust"),
                  _dsum(F.col("c_acctbal")).alias("totacctbal"))
             .orderBy("cntrycode"))


Q22_SQL = f"""
SELECT substring(c_name, length(c_name), 1) AS cntrycode,
       COUNT(*) AS numcust, {_osum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {_oavg('c_acctbal')} FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY 1 ORDER BY cntrycode
"""


# -- scalar-function batches ----------------------------------------------

def string_functions2(spark, sf_dir):
    """lpad/rpad/trim/replace/reverse/repeat/instr/translate/initcap-free
    batch (cross-engine-stable string functions only)."""
    n = _t(spark, sf_dir, "nation")
    return (n.select("n_nationkey",
                     F.lpad("n_name", 12, "*").alias("padded_l"),
                     F.rpad("n_name", 12, "-").alias("padded_r"),
                     F.trim(F.lit("  x  ")).alias("trimmed"),
                     F.replace("n_name", F.lit("A"), F.lit("@")).alias("replaced"),
                     F.reverse("n_name").alias("reversed"),
                     F.repeat(F.substring("n_name", 1, 2), 2).alias("repeated"),
                     F.instr("n_name", "A").alias("a_pos"),
                     F.translate("n_name", "AEI", "aei").alias("translated"),
                     F.length("n_name").alias("name_len"))
             .orderBy("n_nationkey"))


STR2_SQL = """
SELECT n_nationkey,
       lpad(n_name, 12, '*') AS padded_l,
       rpad(n_name, 12, '-') AS padded_r,
       trim('  x  ') AS trimmed,
       replace(n_name, 'A', '@') AS replaced,
       reverse(n_name) AS reversed,
       repeat(substring(n_name, 1, 2), 2) AS repeated,
       CAST(strpos(n_name, 'A') AS INT) AS a_pos,
       translate(n_name, 'AEI', 'aei') AS translated,
       CAST(length(n_name) AS INT) AS name_len
FROM nation ORDER BY n_nationkey
"""


def math_functions(spark, sf_dir):
    """Exactly-representable math batch: floor/ceil/mod/sign/power2/
    greatest/least/round (libm-divergent exp/ln excluded by design)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 30)
    b = F.col("c_acctbal")
    return (c.select("c_custkey",
                     F.floor(b).alias("floor_bal"),
                     F.ceil(b).alias("ceil_bal"),
                     F.round(b, 1).alias("round_bal"),
                     (F.col("c_custkey") % 7).alias("mod7"),
                     F.signum(b).alias("sign_bal"),
                     F.pow(F.col("c_nationkey").cast("double"), 2).alias("nk_sq"),
                     F.greatest(b, F.lit(0.0)).alias("pos_bal"),
                     F.least(F.col("c_nationkey"), F.lit(10)).alias("nk_cap"),
                     F.sqrt(F.abs(b)).alias("sqrt_bal"))
             .orderBy("c_custkey"))


MATH_SQL = """
SELECT c_custkey,
       CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
       CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
       round(c_acctbal, 1) AS round_bal,
       c_custkey % 7 AS mod7,
       CAST(sign(c_acctbal) AS DOUBLE) AS sign_bal,
       power(CAST(c_nationkey AS DOUBLE), 2) AS nk_sq,
       greatest(c_acctbal, 0.0) AS pos_bal,
       least(c_nationkey, 10) AS nk_cap,
       sqrt(abs(c_acctbal)) AS sqrt_bal
FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey
"""


def date_functions(spark, sf_dir):
    """Temporal function batch over o_orderdate (naive timestamps)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    d = F.col("o_orderdate")
    return (o.select("o_orderkey",
                     F.year(d).alias("y"),
                     F.month(d).alias("m"),
                     F.dayofmonth(d).alias("dom"),
                     F.quarter(d).alias("q"),
                     F.dayofweek(d).alias("dow"),
                     F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
                     F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
                      .alias("days_to_end"),
                     F.date_trunc("month", d).alias("month_start"),
                     F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd")
                      .alias("plus30"))
             .orderBy("o_orderkey"))


DATE_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
         AS days_to_end,
       date_trunc('month', o_orderdate) AS month_start,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30
FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
"""


def json_extract_agg(spark, sf_dir):
    """JSON extraction over events.props (get_json_object ≙ DuckDB ->>),
    bucketed aggregate on the extracted value."""
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.withColumn("k", k)
             .groupBy((F.col("k") % 10).alias("k_bucket"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("k").alias("min_k"),
                  F.max("k").alias("max_k"))
             .orderBy("k_bucket"))


JSON_SQL = """
SELECT CAST(k % 10 AS INT) AS k_bucket, COUNT(*) AS n,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM (SELECT CAST(props->>'$.k' AS INT) AS k FROM events)
GROUP BY 1 ORDER BY k_bucket
"""


def distinct_pairs(spark, sf_dir):
    """SELECT DISTINCT (dropDuplicates) on a pair."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.select("l_returnflag", "l_linestatus").distinct()
             .orderBy("l_returnflag", "l_linestatus"))


DP_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


def division_semantics(spark, sf_dir):
    """Integer div/mod vs double division (truncation semantics parity)."""
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 50)
    return (l.select("l_orderkey", "l_linenumber",
                     F.expr("l_orderkey div 7").alias("int_div"),
                     (F.col("l_orderkey") % 7).alias("int_mod"),
                     (F.col("l_quantity") / 3).alias("dbl_div"))
             .orderBy("l_orderkey", "l_linenumber"))


DIV_SQL = """
SELECT l_orderkey, l_linenumber,
       l_orderkey // 7 AS int_div,
       l_orderkey % 7 AS int_mod,
       l_quantity / 3 AS dbl_div
FROM lineitem WHERE l_orderkey <= 50 ORDER BY l_orderkey, l_linenumber
"""


def coalesce_chain(spark, sf_dir):
    """COALESCE / NULLIF chains (3-valued logic parity)."""
    o = _t(spark, sf_dir, "orders")
    v = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")),
                   F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
                   F.lit("fallback"))
    return (o.groupBy(v.alias("resolved"))
             .agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy("resolved"))


COAL_SQL = """
SELECT COALESCE(NULLIF(o_orderstatus, 'O'), NULLIF(o_orderpriority, '5-LOW'),
                'fallback') AS resolved,
       COUNT(*) AS cnt
FROM orders GROUP BY 1 ORDER BY resolved
"""


QUERIES = {
    "q2_top_supplier_per_nation": (q2_top_supplier_per_nation, Q2_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q12_priority_by_year": (q12_priority_by_year, Q12_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q16_supplier_cnt": (q16_supplier_cnt, Q16_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q19_or_of_ands": (q19_or_of_ands, Q19_SQL),
    "q22_global_sales_opportunity": (q22_global_sales_opportunity, Q22_SQL),
    "string_functions2": (string_functions2, STR2_SQL),
    "math_functions": (math_functions, MATH_SQL),
    "date_functions": (date_functions, DATE_SQL),
    "json_extract_agg": (json_extract_agg, JSON_SQL),
    "distinct_pairs": (distinct_pairs, DP_SQL),
    "division_semantics": (division_semantics, DIV_SQL),
    "coalesce_chain": (coalesce_chain, COAL_SQL),
}


def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts
    (left join + two-level aggregation)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        ~F.col("o_orderpriority").like("5%"))
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '5%'
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with maximum revenue (CTE + scalar
    max + equality join back)."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp")))
    s = _t(spark, sf_dir, "supplier")
    rev = (l.groupBy("l_suppkey")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8)
                 .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
               .join(s, rev.l_suppkey == s.s_suppkey)
               .select("s_suppkey", "s_name", "total_revenue")
               .orderBy("s_suppkey"))


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, {_osum('l_extendedprice * (1 - l_discount)', 8)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity (correlated aggregate subquery → per-part avg join)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    avg_q = (l.groupBy(F.col("l_partkey").alias("ap"))
              .agg(_davg(F.col("l_quantity")).alias("avg_qty")))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(avg_q, l.l_partkey == F.col("ap"))
             .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
             .agg((_dsum(F.col("l_extendedprice")) / 7.0)
                  .alias("avg_yearly"),
                  F.count(F.lit(1)).alias("n_lines")))


Q17_SQL = f"""
SELECT {_osum('l_extendedprice')} / 7.0 AS avg_yearly, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.5 * (SELECT {_oavg('l_quantity')}
                          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


QUERIES["q13_order_count_distribution"] = (q13_order_count_distribution, Q13_SQL)
QUERIES["q15_top_supplier"] = (q15_top_supplier, Q15_SQL)
QUERIES["q17_small_quantity_revenue"] = (q17_small_quantity_revenue, Q17_SQL)


def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part value share above a global-scalar
    threshold (group-by + HAVING against a scalar subquery)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    scoped = (l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
               .join(F.broadcast(n), s.s_nationkey == n.n_nationkey))
    per_part = (scoped.groupBy("l_partkey")
                      .agg(_dsum(val, 8).alias("part_value")))
    total = scoped.agg((_dsum(val, 8) * 0.001).alias("threshold"))
    return (per_part.join(F.broadcast(total))
                    .where(F.col("part_value") > F.col("threshold"))
                    .select("l_partkey", "part_value")
                    .orderBy(F.desc("part_value"), "l_partkey")
                    .limit(50))


Q11_SQL = f"""
WITH scoped AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1')
SELECT l_partkey, {_osum('val', 8)} AS part_value
FROM scoped GROUP BY l_partkey
HAVING {_osum('val', 8)} > (SELECT {_osum('val', 8)} * 0.001 FROM scoped)
ORDER BY part_value DESC, l_partkey LIMIT 50
"""


def q20_excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers shipping above-threshold volume of
    name-matched parts in a year (nested semi-join chain)."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    shipped = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
                .groupBy("l_suppkey")
                .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
                .where(F.col("total_qty") > 400))
    return (s.join(shipped, s.s_suppkey == shipped.l_suppkey, "left_semi")
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .select("s_suppkey", "s_name", "n_name")
             .orderBy("s_suppkey"))


Q20_SQL = f"""
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING {_osum('l_quantity')} > 400)
ORDER BY s_suppkey
"""


def q21_sole_supplier_orders(spark, sf_dir):
    """TPC-H Q21 shape: suppliers appearing as the ONLY supplier on an
    order with returned items (multi-predicate exists/not-exists →
    per-order distinct-count then filter)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    per_order = (l.groupBy("l_orderkey")
                  .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                       F.max(F.when(F.col("l_returnflag") == "R", 1)
                              .otherwise(0)).alias("has_return")))
    sole = per_order.where((F.col("n_supp") == 1) & (F.col("has_return") == 1))
    return (l.join(sole.select("l_orderkey"), "l_orderkey", "left_semi")
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .groupBy("s_suppkey", "s_name")
             .agg(F.countDistinct("l_orderkey").alias("numwait"))
             .orderBy(F.desc("numwait"), "s_suppkey")
             .limit(20))


Q21_SQL = """
WITH sole AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) = 1
     AND MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1)
SELECT s_suppkey, s_name, COUNT(DISTINCT l_orderkey) AS numwait
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE l_orderkey IN (SELECT l_orderkey FROM sole)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey LIMIT 20
"""


QUERIES["q11_important_stock"] = (q11_important_stock, Q11_SQL)
QUERIES["q20_excess_stock_suppliers"] = (q20_excess_stock_suppliers, Q20_SQL)
QUERIES["q21_sole_supplier_orders"] = (q21_sole_supplier_orders, Q21_SQL)
