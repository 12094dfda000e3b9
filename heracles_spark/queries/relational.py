"""Relational query corpus — SURVEY §2.3-§2.8 re-expressed Spark-first.

Each entry: name -> (spark_fn, oracle_sql). spark_fn(spark, sf_dir) uses
the DataFrame API (declarative → Catalyst picks the physical strategy);
oracle_sql is the DuckDB-equivalent over the pre-registered views.

Determinism contract for cross-engine value-hash matching: floating-point
aggregates are summed as DECIMAL(38,k) (exact, order-independent) and cast
back to DOUBLE at the end, so Spark's partial/parallel aggregation and
DuckDB's sequential aggregation produce bit-identical results. Per-row
double arithmetic (products, differences) is IEEE-deterministic and safe.
Averages are computed as exact-decimal-sum / count in double. Every
computed column is aliased identically on both sides (driver sorts columns
by name before hashing).

Reference query shapes covered (file:line into /root/reference):
- point lookups / key ranges on the composite key
  (HBaseTpcMiniTestSuite.scala:113-135)
- group-by + COUNT/SUM/AVG/MIN/MAX + HAVING (HBaseAggregateQueriesSuite.scala:23-93)
- COUNT(DISTINCT), multi-column (HBaseSQLQuerySuite.scala:296-300)
- IS NULL / IS NOT NULL / OR matrix (HBaseTpcMiniTestSuite.scala:299-339)
- joins: inner/left/right/full/semi/cross (HBaseSQLQuerySuite.scala:324-424)
- set ops: UNION [ALL] / EXCEPT / INTERSECT (HBaseSQLQuerySuite.scala:521-574)
- ORDER BY / LIMIT / top-k (HBaseBasicQueriesSuite.scala:22-57)
- scalar functions, CASE WHEN, BETWEEN, IN, LIKE, bitwise, null-safe =
  (HBaseSQLQuerySuite.scala:69-127,485-519,693-758,928-998)
- window functions (absent in the reference — SURVEY §2.5 — inherited
  from Spark; included here for coverage)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from heracles_spark import plancache

    return plancache.table(spark, f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.parquet to (ts: TIMESTAMP_NTZ, ts_ns: epoch nanos).

    The generated file's physical type has varied across driver versions:
    TIMESTAMP(NANOS) (Spark reads as long with nanosAsLong) vs
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark reads as
    TIMESTAMP_NTZ). Detect the loaded dtype and derive both columns so
    every downstream query is layout-independent and, because everything
    stays NTZ, session-timezone-independent (DuckDB's TIMESTAMP is naive
    too)."""
    from heracles_spark import plancache

    def build() -> DataFrame:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        e = plancache.table(spark, f"{sf_dir}/events.parquet")
        ts_type = dict(e.dtypes)["ts"]
        if ts_type in ("bigint", "long"):
            return (e.withColumn("ts_ns", F.col("ts").cast("long"))
                     .withColumn("ts", F.expr(
                         "timestampadd(MICROSECOND, ts div 1000, "
                         "TIMESTAMP_NTZ '1970-01-01 00:00:00')")))
        # Epoch micros via FIELD EXTRACTION, not timestampdiff: Spark
        # promotes timestampdiff's TIMESTAMP_NTZ args to TIMESTAMP in
        # the SESSION timezone, so on a DST-having session tz the
        # result shifts an hour around transitions (a value inside the
        # spring-forward gap lands 1h off). unix_date/hour/minute/
        # extract(SECOND) read NTZ fields directly — tz-free.
        return (e.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
                 .withColumn("ts_ns", F.expr(
                     "(unix_date(cast(ts as date)) * 86400000000"
                     " + cast(hour(ts) as bigint) * 3600000000"
                     " + cast(minute(ts) as bigint) * 60000000"
                     " + cast(extract(SECOND from ts) * 1000000"
                     "        as bigint)) * 1000")))

    return plancache.memo(spark, ("events-normalized", sf_dir), build)


def _dsum(col, scale: int = 6):
    """Order-independent sum: exact decimal accumulate, double result."""
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double")


def _davg(col, scale: int = 6):
    return (F.sum(col.cast(f"decimal(38,{scale})")).cast("double")
            / F.count(col)).cast("double")


def _osum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def _oavg(expr: str, scale: int = 6) -> str:
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"
            f" / COUNT({expr}) AS DOUBLE)")


# -- fast exact aggregation (integer-cents path) ----------------------------
#
# _dsum's DECIMAL(38,s) accumulator is exact at any scale but runs on
# Spark's BigDecimal representation (any precision > 18 digits) —
# measured ~0.6s/query slower than primitive sums on wide aggregates at
# sf0.1. The fast path scales each value to an integer number of
# "cents" — ROUND(expr * 10^s) — and sums LONGs, the cheapest
# whole-stage-codegen accumulator there is.
#
# Cross-engine determinism: expr * 10^s is the SAME IEEE-754 double in
# Spark and any other engine evaluating the same expression tree, and
# ROUND of a double is half-away-from-zero in both Spark and DuckDB, so
# the per-row integers are bit-identical across engines (casting to
# DECIMAL(p,s) instead is NOT portable: Spark rounds the exact binary
# expansion, DuckDB rounds after a double multiply — observed +-1-cent
# per-row ties at s=2). Integer sums are then order-independent and
# engine-independent by construction.
#
# Overflow discipline at 100 TB:
#   * bounded groups (per-order, per-customer — group size fixed by the
#     data model, independent of SF): single-level `_fsum`; a group
#     total cannot approach 2^63.
#   * unbounded groups (per-nation, global — group size grows with SF):
#     `fast_exact_agg`; per-(group, input-partition) partials accumulate
#     as longs (one <=128MB split: ~2e6 rows x <1e8 cents = 2e14 <<
#     9.2e18), then an exact DECIMAL(38,0) refold merges the partial
#     set. One extra (tiny) stage; moves no more data than the
#     single-level partial-agg shuffle does.

def _cents(col, scale: int):
    return F.round(col * F.lit(float(10 ** scale))).cast("long")


def _fsum(col, scale: int = 2):
    """Exact order-independent sum for BOUNDED groups: long accumulation
    of ROUND(value * 10^scale), double result."""
    return (F.sum(_cents(col, scale)).cast("double")
            / F.lit(float(10 ** scale)))


def fast_exact_agg(df, group_cols: list[str], sums=(), avgs=(), counts=()):
    """Exact order-independent aggregation for UNBOUNDED groups on the
    integer-cents path (see block comment above).

    sums/avgs: (alias, Column, scale); counts: alias strings (COUNT(*)).
    Returns one row per group."""
    part, final = [], []

    def _refold(name):
        return F.sum(F.col(name).cast("decimal(38,0)")).cast("double")

    for alias, col, scale in sums:
        part.append(F.sum(_cents(col, scale)).alias(f"__s_{alias}"))
        final.append((_refold(f"__s_{alias}") / F.lit(float(10 ** scale)))
                     .alias(alias))
    for alias, col, scale in avgs:
        part.append(F.sum(_cents(col, scale)).alias(f"__a_{alias}"))
        part.append(F.count(col).alias(f"__c_{alias}"))
        final.append(((_refold(f"__a_{alias}") / F.lit(float(10 ** scale)))
                      / F.sum(f"__c_{alias}")).cast("double").alias(alias))
    for alias in counts:
        part.append(F.count(F.lit(1)).alias(f"__n_{alias}"))
        final.append(F.sum(f"__n_{alias}").alias(alias))
    partials = (df.withColumn("__pid", F.spark_partition_id())
                  .groupBy(*group_cols, "__pid").agg(*part))
    return partials.groupBy(*group_cols).agg(*final)


def _osum8(expr: str, scale: int = 2) -> str:
    """Oracle mirror of _fsum / fast_exact_agg sums: DuckDB's BIGINT sum
    is exact (hugeint), so one level reproduces the two-level refold."""
    m = float(10 ** scale)
    return (f"CAST(SUM(CAST(ROUND(({expr}) * {m!r}) AS BIGINT)) AS DOUBLE)"
            f" / {m!r}")


def _oavg8(expr: str, scale: int = 2) -> str:
    return (f"CAST({_osum8(expr, scale)} / COUNT({expr}) AS DOUBLE)")


# --------------------------------------------------------------------------
# TPC-H-style analytic queries
# --------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy filter + 8-aggregate group-by.

    Scale: single shuffle on 2 low-cardinality keys; partial aggregation
    map-side; filter + column pruning pushed to parquet."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Returnflag x linestatus groups span the whole table (unbounded at
    # scale) -> two-level fast_exact_agg.
    return (fast_exact_agg(
                l.where(F.col("l_shipdate")
                        <= F.lit("1998-09-02").cast("timestamp")),
                ["l_returnflag", "l_linestatus"],
                sums=[("sum_qty", F.col("l_quantity"), 2),
                      ("sum_base_price", F.col("l_extendedprice"), 2),
                      ("sum_disc_price", disc_price, 2),
                      ("sum_charge", charge, 2)],
                avgs=[("avg_qty", F.col("l_quantity"), 6),
                      ("avg_price", F.col("l_extendedprice"), 2),
                      ("avg_disc", F.col("l_discount"), 6)],
                counts=["count_order"])
            .orderBy("l_returnflag", "l_linestatus"))


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_osum8('l_quantity')} AS sum_qty,
       {_osum8('l_extendedprice')} AS sum_base_price,
       {_osum8('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_osum8('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_oavg8('l_quantity', 6)} AS avg_qty,
       {_oavg8('l_extendedprice')} AS avg_price,
       {_oavg8('l_discount', 6)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, group, top-10 by revenue.

    Scale: customer filter before join; orders⋈lineitem is the big
    shuffle — AQE handles skew; top-k via TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .groupBy("l_orderkey", "o_orderdate")
             # per-order group: bounded size -> single-level long path
             .agg(_fsum(rev).alias("revenue"))
             .orderBy(F.desc("revenue"), "l_orderkey")
             .limit(10))


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
       {_osum8('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 5-way join through region→nation→(customer,supplier).

    Scale: region/nation/supplier broadcast (dims); the lineitem⋈orders
    shuffle dominates and AQE coalesces its output."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(c, (o.o_custkey == c.c_custkey)
                   & (c.c_nationkey == s.s_nationkey))
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             # per-nation groups grow with SF -> two-level refold
             .transform(lambda j: fast_exact_agg(
                 j, ["n_name"], sums=[("revenue", rev, 2)]))
             .orderBy(F.desc("revenue"), "n_name"))


Q5_SQL = f"""
SELECT n_name, {_osum8('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + filter + scalar aggregate. The filters
    all push to parquet (PushedFilters on l_shipdate/l_discount/l_quantity)."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("l_discount").between(0.03, 0.07))
                    & (F.col("l_quantity") < 24))
             .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), 8)
                  .alias("revenue")))


Q6_SQL = f"""
SELECT {_osum('l_extendedprice * l_discount', 8)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-items revenue per customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy("c_custkey", "c_name", "n_name")
             # per-customer group: bounded (orders/customer is fixed by
             # the data model, independent of SF) -> single-level
             .agg(_fsum(rev).alias("revenue"))
             .orderBy(F.desc("revenue"), "c_custkey")
             .limit(20))


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {_osum8('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# Key-organized access patterns (≙ HBaseTpcMiniTestSuite point/range shapes)
# --------------------------------------------------------------------------

def point_lookup(spark, sf_dir):
    """Full-key point lookup (≙ point-Get conversion,
    HBaseSQLReaderRDD.scala:276-328): both equality predicates push to
    parquet and skip non-matching row groups."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.where((F.col("l_orderkey") == 100) & (F.col("l_linenumber") == 1))
             .select("l_orderkey", "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_returnflag"))


POINT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem WHERE l_orderkey = 100 AND l_linenumber = 1
"""


def key_range_scan(spark, sf_dir):
    """Leading-key range scan (≙ CPR range pruning,
    HBaseCriticalPoint.scala:646-731): min/max row-group skip on l_orderkey."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.where((F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 1100))
             .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
             .orderBy("l_orderkey", "l_linenumber"))


RANGE_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 1100
ORDER BY l_orderkey, l_linenumber
"""


def topk_orders(spark, sf_dir):
    """ORDER BY + LIMIT → TakeOrderedAndProject (no total sort at scale)."""
    o = _t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_custkey", "o_totalprice")
             .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(10))


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --------------------------------------------------------------------------
# Aggregation shapes
# --------------------------------------------------------------------------

def agg_having(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_suppkey")
             .agg(F.count(F.lit(1)).alias("cnt"),
                  _dsum(F.col("l_quantity")).alias("total_qty"),
                  F.min("l_quantity").alias("min_qty"),
                  F.max("l_quantity").alias("max_qty"))
             .where(F.col("cnt") > 550)
             .orderBy("l_suppkey"))


HAVING_SQL = f"""
SELECT l_suppkey, COUNT(*) AS cnt, {_osum('l_quantity')} AS total_qty,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 550 ORDER BY l_suppkey
"""


def count_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n_customers"),
                  F.count(F.lit(1)).alias("n_orders"))
             .orderBy("o_orderpriority"))


CD_SQL = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def multi_count_distinct(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey").alias("n_parts"),
                  F.countDistinct("l_suppkey").alias("n_supps"),
                  F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"))
             .orderBy("l_returnflag"))


MCD_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def group_by_expr(spark, sf_dir):
    """Grouping on an expression of the key (≙ agg-on-expression grouping,
    HBaseAggregateQueriesSuite)."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("order_year"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  _dsum(F.col("o_totalprice")).alias("total_sales"))
             .orderBy("order_year"))


GBE_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year, COUNT(*) AS n_orders,
       {_osum('o_totalprice')} AS total_sales
FROM orders GROUP BY 1 ORDER BY order_year
"""


def rollup_agg(spark, sf_dir):
    """ROLLUP grouping sets (inherited; absent from the reference —
    SURVEY §2.4 'no grouping sets' — included for surface completeness)."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.rollup("l_returnflag", "l_linestatus")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.col("l_returnflag").asc_nulls_first(),
                      F.col("l_linestatus").asc_nulls_first()))


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def cube_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.col("o_orderstatus").asc_nulls_first(),
                      F.col("o_orderpriority").asc_nulls_first()))


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def approx_distinct(spark, sf_dir):
    """HLL++ approx count distinct (≙ HBaseSQLQuerySuite.scala:302-313).
    Sketch values are engine-specific, so the oracle pins the error
    CONTRACT instead: |approx − exact| ≤ 3·rsd·exact rendered as a
    boolean the SQL oracle fixes at TRUE. Stable under any partitioning:
    HLL register merges are max() — commutative and order-free — so the
    sketch value is identical in the driver's vanilla session."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.agg(F.approx_count_distinct("l_partkey", rsd=0.05)
                   .alias("ap"),
                  F.countDistinct("l_partkey").alias("exact_parts"))
             .select("exact_parts",
                     (F.abs(F.col("ap") - F.col("exact_parts"))
                      <= 0.15 * F.col("exact_parts")).alias("within_3rsd")))


AD_SQL = """
SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_3rsd
FROM lineitem
"""


# --------------------------------------------------------------------------
# Predicates / scalar functions / null semantics
# --------------------------------------------------------------------------

def case_when(spark, sf_dir):
    """Both CASE forms (≙ HBaseSQLQuerySuite.scala:748-758)."""
    o = _t(spark, sf_dir, "orders")
    bucket = (F.when(F.col("o_totalprice") < 50000, "small")
               .when(F.col("o_totalprice") < 200000, "medium")
               .otherwise("large"))
    return (o.groupBy(bucket.alias("price_bucket"))
             .agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy("price_bucket"))


CASE_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       COUNT(*) AS cnt
FROM orders GROUP BY 1 ORDER BY price_bucket
"""


def filter_in_between_like(spark, sf_dir):
    """IN-list + BETWEEN + LIKE (≙ HBaseSQLQuerySuite.scala:693-708,959-962)."""
    p = _t(spark, sf_dir, "part")
    return (p.where(F.col("p_size").between(10, 20)
                    & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
                    & F.col("p_type").like("%AND%"))
             .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
             .orderBy("p_partkey"))


IBL_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_size BETWEEN 10 AND 20
  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND p_type LIKE '%AND%'
ORDER BY p_partkey
"""


def null_matrix(spark, sf_dir):
    """IS NULL / IS NOT NULL / OR matrix (≙ HBaseTpcMiniTestSuite.scala:
    299-339; null ⟺ absent cell, HBaseRelation.scala:902-903). The base
    tables are dense, so nulls are derived with NULLIF — semantics
    identical."""
    o = _t(spark, sf_dir, "orders")
    d = o.withColumn("maybe_status", F.nullif(F.col("o_orderstatus"), F.lit("O")))
    return (d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("maybe_status").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(F.col("maybe_status").isNotNull(), 1).otherwise(0)).alias("n_not_null"),
        F.sum(F.when(F.col("maybe_status").isNull()
                     | (F.col("o_totalprice") > 300000), 1).otherwise(0)).alias("n_null_or_big"),
        F.count("maybe_status").alias("n_count_col")))


NULLM_SQL = """
SELECT COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
       CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL OR o_totalprice > 300000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_null_or_big,
       COUNT(NULLIF(o_orderstatus, 'O')) AS n_count_col
FROM orders
"""


def nullsafe_eq(spark, sf_dir):
    """Null-safe equality <=> (≙ HBaseSQLQuerySuite.scala:988-998);
    DuckDB spells it IS NOT DISTINCT FROM."""
    o = _t(spark, sf_dir, "orders")
    d = o.withColumn("maybe_status", F.nullif(F.col("o_orderstatus"), F.lit("O")))
    return (d.where(F.col("maybe_status").eqNullSafe(F.lit(None).cast("string")))
             .agg(F.count(F.lit(1)).alias("n_null_rows")))


NSE_SQL = """
SELECT COUNT(*) AS n_null_rows
FROM orders
WHERE NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM CAST(NULL AS VARCHAR)
"""


def scalar_functions(spark, sf_dir):
    """ABS/SQRT/SUBSTR/UPPER/LOWER/CONCAT/CAST (≙ HBaseSQLQuerySuite.scala:
    69-127,485-519)."""
    c = _t(spark, sf_dir, "customer")
    return (c.where(F.col("c_custkey") <= 20)
             .select("c_custkey",
                     F.abs(F.col("c_acctbal")).alias("abs_bal"),
                     F.sqrt(F.abs(F.col("c_acctbal"))).alias("sqrt_bal"),
                     F.upper(F.col("c_name")).alias("upper_name"),
                     F.lower(F.col("c_mktsegment")).alias("lower_seg"),
                     F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
                     F.concat(F.col("c_name"), F.lit("#"),
                              F.col("c_custkey").cast("string")).alias("tagged"),
                     F.col("c_nationkey").cast("long").alias("nation_l"))
             .orderBy("c_custkey"))


SCALAR_SQL = """
SELECT c_custkey,
       ABS(c_acctbal) AS abs_bal,
       SQRT(ABS(c_acctbal)) AS sqrt_bal,
       UPPER(c_name) AS upper_name,
       LOWER(c_mktsegment) AS lower_seg,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       c_name || '#' || CAST(c_custkey AS VARCHAR) AS tagged,
       CAST(c_nationkey AS BIGINT) AS nation_l
FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey
"""


def bitwise_ops(spark, sf_dir):
    """Bitwise & | ^ ~ (≙ HBaseSQLQuerySuite.scala:928-942)."""
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 40)
    return (l.select("l_orderkey", "l_linenumber",
                     (F.col("l_linenumber").bitwiseAND(F.lit(3))).alias("b_and"),
                     (F.col("l_linenumber").bitwiseOR(F.lit(8))).alias("b_or"),
                     (F.col("l_linenumber").bitwiseXOR(F.lit(5))).alias("b_xor"),
                     F.expr("~ l_linenumber").alias("b_not"))
             .orderBy("l_orderkey", "l_linenumber"))


BITWISE_SQL = """
SELECT l_orderkey, l_linenumber,
       l_linenumber & 3 AS b_and,
       l_linenumber | 8 AS b_or,
       xor(l_linenumber, 5) AS b_xor,
       ~ l_linenumber AS b_not
FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber
"""


def arithmetic_predicate(spark, sf_dir):
    """Arithmetic inside the predicate (≙ HBaseTpcMiniTestSuite.scala:
    293-297 `ss_ticket_number + 0 = 3`): still pushes as a filter after
    Catalyst constant-folds."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.where((F.col("l_orderkey") + 0 == 500)
                    & (F.col("l_quantity") * 2 > 10))
             .select("l_orderkey", "l_linenumber", "l_quantity")
             .orderBy("l_linenumber"))


ARITH_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_orderkey + 0 = 500 AND l_quantity * 2 > 10
ORDER BY l_linenumber
"""


# --------------------------------------------------------------------------
# Joins (all inherited operators — SURVEY §2.3)
# --------------------------------------------------------------------------

def join_inner(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (n.join(r, n.n_regionkey == r.r_regionkey, "inner")
             .select("n_nationkey", "n_name", "r_name")
             .orderBy("n_nationkey"))


JI_SQL = """
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey
"""


def join_left(spark, sf_dir):
    """Left outer: customers (incl. those with no orders) + order counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
             .groupBy("c_custkey")
             .agg(F.count("o_orderkey").alias("n_orders"))
             .where(F.col("n_orders") <= 2)
             .orderBy("c_custkey"))


JL_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey HAVING COUNT(o_orderkey) <= 2 ORDER BY c_custkey
"""


def join_right(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (s.join(n, s.s_nationkey == n.n_nationkey, "right")
             .groupBy("n_nationkey", "n_name")
             .agg(F.count("s_suppkey").alias("n_suppliers"))
             .orderBy("n_nationkey"))


JR_SQL = """
SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name ORDER BY n_nationkey
"""


def join_full(spark, sf_dir):
    """Full outer over two aggregates with disjoint key coverage."""
    o = _t(spark, sf_dir, "orders")
    big = (o.where(F.col("o_totalprice") > 350000)
            .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_big")))
    urgent = (o.where(F.col("o_orderpriority") == "1-URGENT")
               .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_urgent")))
    return (big.withColumnRenamed("o_custkey", "custkey_b")
               .join(urgent.withColumnRenamed("o_custkey", "custkey_u"),
                     F.col("custkey_b") == F.col("custkey_u"), "full")
               .select(F.coalesce("custkey_b", "custkey_u").alias("custkey"),
                       F.coalesce("n_big", F.lit(0)).alias("n_big"),
                       F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"))
               .orderBy("custkey"))


JF_SQL = """
WITH big AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
             WHERE o_totalprice > 350000 GROUP BY o_custkey),
     urgent AS (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
                WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
SELECT COALESCE(big.o_custkey, urgent.o_custkey) AS custkey,
       COALESCE(n_big, 0) AS n_big,
       COALESCE(n_urgent, 0) AS n_urgent
FROM big FULL OUTER JOIN urgent ON big.o_custkey = urgent.o_custkey
ORDER BY custkey
"""


def join_semi(spark, sf_dir):
    """Left semi (≙ HBaseSQLQuerySuite.scala:163-171): customers with at
    least one high-value order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .select("c_custkey", "c_name")
             .orderBy("c_custkey"))


JS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
ORDER BY c_custkey
"""


def join_anti(spark, sf_dir):
    """Left anti: customers with no orders at all."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name")
             .orderBy("c_custkey"))


JA_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def join_cross(spark, sf_dir):
    """Cross join (≙ HBaseAdditionalQuerySuite.scala:161-170) over the two
    small dims."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey")
    return (n.crossJoin(r)
             .agg(F.count(F.lit(1)).alias("n_pairs"),
                  F.sum(F.col("n_nationkey") * F.col("r_regionkey")).alias("xsum")))


JX_SQL = """
SELECT COUNT(*) AS n_pairs, CAST(SUM(n_nationkey * r_regionkey) AS BIGINT) AS xsum
FROM nation CROSS JOIN region
"""


def theta_join(spark, sf_dir):
    """Non-equi (theta) join → BroadcastNestedLoopJoin on the broadcast
    side (≙ theta-semi test, HBaseSQLQuerySuite.scala:163-171)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (s.join(F.broadcast(n), s.s_nationkey < n.n_nationkey)
             .groupBy("s_suppkey")
             .agg(F.count(F.lit(1)).alias("n_greater"))
             .orderBy("s_suppkey"))


THETA_SQL = """
SELECT s_suppkey, COUNT(*) AS n_greater
FROM supplier JOIN nation ON s_nationkey < n_nationkey
GROUP BY s_suppkey ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# --------------------------------------------------------------------------

def set_union_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (c.unionAll(s).groupBy("nationkey")
             .agg(F.count(F.lit(1)).alias("cnt")).orderBy("nationkey"))


SUA_SQL = """
SELECT nationkey, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey ORDER BY nationkey
"""


def set_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


SU_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def set_except(spark, sf_dir):
    """EXCEPT (≙ HBaseSQLQuerySuite.scala:552-563): nations with customers
    but no suppliers."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


SE_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


SI_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.5 — inherited, tested for coverage)
# --------------------------------------------------------------------------

def window_row_number(spark, sf_dir):
    """Top-3 orders per customer by price — row_number over partition."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
               .orderBy(F.desc("o_totalprice"), F.col("o_orderkey")))
    return (o.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") <= 3)
             .where(F.col("o_custkey") <= 100)
             .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
             .orderBy("o_custkey", "rn"))


WRN_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3 AND o_custkey <= 100
ORDER BY o_custkey, rn
"""


def window_rank_dense(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"), "p_partkey")
    return (p.withColumn("rk", F.rank().over(w))
             .withColumn("drk", F.dense_rank().over(w))
             .where((F.col("rk") <= 2) & (F.col("p_partkey") <= 500))
             .select("p_brand", "p_partkey", "p_size", "rk", "drk")
             .orderBy("p_brand", "rk", "p_partkey"))


WRK_SQL = """
SELECT p_brand, p_partkey, p_size, rk, drk FROM (
  SELECT p_brand, p_partkey, p_size,
         RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS rk,
         DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS drk
  FROM part
) WHERE rk <= 2 AND p_partkey <= 500
ORDER BY p_brand, rk, p_partkey
"""


def window_running_sum(spark, sf_dir):
    """Running total per customer ordered by date — decimal accumulate so
    the running values hash-match."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    w = (Window.partitionBy("o_custkey")
               .orderBy("o_orderdate", "o_orderkey")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (o.select("o_custkey", "o_orderkey", "o_orderdate",
                     F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
                      .over(w).cast("double").alias("running_total"))
             .orderBy("o_custkey", "o_orderdate", "o_orderkey"))


WRS_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_total
FROM orders WHERE o_custkey <= 50
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def window_lag_lead(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 30)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.select("o_custkey", "o_orderkey",
                     F.lag("o_totalprice", 1).over(w).alias("prev_price"),
                     F.lead("o_totalprice", 1).over(w).alias("next_price"))
             .orderBy("o_custkey", "o_orderkey"))


WLL_SQL = """
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev_price,
       LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders WHERE o_custkey <= 30
ORDER BY o_custkey, o_orderkey
"""


def window_moving_avg(spark, sf_dir):
    """Moving average over a 3-row frame, decimal-exact then double."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = (Window.partitionBy("o_custkey")
               .orderBy("o_orderdate", "o_orderkey")
               .rowsBetween(-2, Window.currentRow))
    msum = F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w)
    mcnt = F.count(F.lit(1)).over(w)
    return (o.select("o_custkey", "o_orderkey",
                     (msum.cast("double") / mcnt).alias("moving_avg"))
             .orderBy("o_custkey", "o_orderkey"))


WMA_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
            OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg
FROM orders WHERE o_custkey <= 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


# --------------------------------------------------------------------------
# Events: temporal aggregation + sessionization
# --------------------------------------------------------------------------

def events_hourly_agg(spark, sf_dir):
    """Tumbling-hour aggregate — the batch twin of the streaming windowed
    agg (heracles_spark.streaming)."""
    e = _events(spark, sf_dir)
    return (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                      F.col("event_type"))
             .agg(F.count(F.lit(1)).alias("n_events"),
                  _dsum(F.col("value")).alias("total_value"))
             .where(F.col("n_events") > 0)
             .orderBy("hour", "event_type")
             .limit(200))


EHA_SQL = f"""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       COUNT(*) AS n_events, {_osum('value')} AS total_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type LIMIT 200
"""


def events_sessionize(spark, sf_dir):
    """Sessionization via window functions: a session break is a >30 min
    gap per user; session count = sum of breaks + 1. Runs as two window
    passes over one hash-partition by user — no Python, fully codegen'd."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.when(
        F.lag("ts_ns", 1).over(w).isNull()
        | (F.col("ts_ns") - F.lag("ts_ns", 1).over(w) > 1800 * 1_000_000_000),
        1).otherwise(0)
    return (e.withColumn("is_new_session", gap)
             .groupBy("user_id")
             .agg(F.sum("is_new_session").alias("n_sessions"),
                  F.count(F.lit(1)).alias("n_events"))
             .where(F.col("user_id") <= 200)
             .orderBy("user_id"))


SESS_SQL = """
SELECT user_id, CAST(SUM(is_new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id, event_id,
         CASE WHEN LAG(ts, 1) OVER w IS NULL
                   OR epoch_ns(ts) - epoch_ns(LAG(ts, 1) OVER w)
                      > 1800000000000
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
)
GROUP BY user_id HAVING user_id <= 200 ORDER BY user_id
"""


def subquery_in(spark, sf_dir):
    """IN-subquery (uncorrelated) — orders from the top-balance nation's
    customers."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rich = c.where(F.col("c_acctbal") > 9900).select("c_custkey")
    return (o.join(rich, o.o_custkey == rich.c_custkey, "left_semi")
             .groupBy("o_orderstatus")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy("o_orderstatus"))


SUBQ_SQL = """
SELECT o_orderstatus, COUNT(*) AS cnt
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def scalar_subquery_agg(spark, sf_dir):
    """Scalar subquery: orders above the global average price."""
    o = _t(spark, sf_dir, "orders")
    avg_price = o.agg(_davg(F.col("o_totalprice")).alias("a"))
    return (o.join(F.broadcast(avg_price))
             .where(F.col("o_totalprice") > F.col("a") * 2)
             .agg(F.count(F.lit(1)).alias("n_above")))


SSA_SQL = f"""
SELECT COUNT(*) AS n_above FROM orders
WHERE o_totalprice > (SELECT {_oavg('o_totalprice')} FROM orders) * 2
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "point_lookup": (point_lookup, POINT_SQL),
    "key_range_scan": (key_range_scan, RANGE_SQL),
    "topk_orders": (topk_orders, TOPK_SQL),
    "agg_having": (agg_having, HAVING_SQL),
    "count_distinct": (count_distinct, CD_SQL),
    "multi_count_distinct": (multi_count_distinct, MCD_SQL),
    "group_by_expr": (group_by_expr, GBE_SQL),
    "rollup_agg": (rollup_agg, ROLLUP_SQL),
    "cube_agg": (cube_agg, CUBE_SQL),
    "approx_distinct": (approx_distinct, AD_SQL),
    "case_when": (case_when, CASE_SQL),
    "filter_in_between_like": (filter_in_between_like, IBL_SQL),
    "null_matrix": (null_matrix, NULLM_SQL),
    "nullsafe_eq": (nullsafe_eq, NSE_SQL),
    "scalar_functions": (scalar_functions, SCALAR_SQL),
    "bitwise_ops": (bitwise_ops, BITWISE_SQL),
    "arithmetic_predicate": (arithmetic_predicate, ARITH_SQL),
    "join_inner": (join_inner, JI_SQL),
    "join_left": (join_left, JL_SQL),
    "join_right": (join_right, JR_SQL),
    "join_full": (join_full, JF_SQL),
    "join_semi": (join_semi, JS_SQL),
    "join_anti": (join_anti, JA_SQL),
    "join_cross": (join_cross, JX_SQL),
    "theta_join": (theta_join, THETA_SQL),
    "set_union_all": (set_union_all, SUA_SQL),
    "set_union": (set_union, SU_SQL),
    "set_except": (set_except, SE_SQL),
    "set_intersect": (set_intersect, SI_SQL),
    "window_row_number": (window_row_number, WRN_SQL),
    "window_rank_dense": (window_rank_dense, WRK_SQL),
    "window_running_sum": (window_running_sum, WRS_SQL),
    "window_lag_lead": (window_lag_lead, WLL_SQL),
    "window_moving_avg": (window_moving_avg, WMA_SQL),
    "events_hourly_agg": (events_hourly_agg, EHA_SQL),
    "events_sessionize": (events_sessionize, SESS_SQL),
    "subquery_in": (subquery_in, SUBQ_SQL),
    "scalar_subquery_agg": (scalar_subquery_agg, SSA_SQL),
}
