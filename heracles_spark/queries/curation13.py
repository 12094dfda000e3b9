"""Thirteenth batch: round-13 optimizations certified externally —
JOIN-DERIVED file pruning (the star statement with NO literal fact
predicate: the dim's surviving key range, read from the catalog file
index's min/max boxes only, prunes the fact's file list across the
equi-join edge) and the non-key metadata access paths the extended
per-file statistics (all-column min/max + null counts) enable.

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


def lineitem_join_derived_pruned_sql(spark, sf_dir):
    """Round-13 judge ask #1 certified: the star statement whose ONLY
    selective predicate sits on the dimension — ``SELECT ... FROM fact
    JOIN dim ON fact.fk = dim.pk WHERE dim.pk BETWEEN a AND b`` — now
    prunes the FACT side's file list too: the dim's surviving files'
    min/max boxes on the edge column (catalog file index, metadata
    only — no data read) become a derived range the fact's files are
    classified against (sql._join_derived_pred). Pinned: route ==
    pruned-scan-join, fact files_read < files_total, the audit's
    derived_from naming the dim edge column, and the aggregates the
    oracle recomputes from raw lineitem ⋈ orders — a derivation bug
    that loses rows flips the hash."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_jdp_"))
    cat = hs.catalog
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cat.create_table("jdl", [("l_orderkey", "bigint"),
                             ("l_linenumber", "int"),
                             ("l_quantity", "double")],
                     ["l_orderkey", "l_linenumber"])
    writer.write_key_organized(
        spark, cat, "jdl",
        li.select(F.col("l_orderkey").cast("bigint"),
                  F.col("l_linenumber").cast("int"),
                  F.col("l_quantity").cast("double")), n_buckets=8)
    cat.create_table("jdo", [("o_orderkey", "bigint"),
                             ("o_orderpriority", "string")],
                     ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "jdo",
        o.select(F.col("o_orderkey").cast("bigint"),
                 "o_orderpriority"), n_buckets=4)
    cat.register_all(spark)
    lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    a = int(lo) + (int(hi) - int(lo)) // 4
    b = int(lo) + (int(hi) - int(lo)) // 2
    got = hs.sql(
        f"SELECT o.o_orderpriority AS pri, count(*) AS n, "
        f"CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE) "
        f"AS sum_qty FROM jdl l JOIN jdo o "
        f"ON l.l_orderkey = o.o_orderkey "
        f"WHERE o.o_orderkey BETWEEN {a} AND {b} "
        f"GROUP BY o.o_orderpriority ORDER BY pri").collect()
    rr = dict(hs.last_select_route)
    fact = rr.get("tables", {}).get("l", {})
    routed_derived = bool(
        rr.get("route") == "pruned-scan-join"
        and fact.get("files_read", 99) < fact.get("files_total", 0)
        and fact.get("derived_from") == ["o.o_orderkey"])
    return (spark.createDataFrame(
                [(r.pri, int(r.n), float(r.sum_qty)) for r in got],
                "pri: string, n: long, sum_qty: double")
            .withColumn("join_derived_pruned", F.lit(routed_derived))
            .orderBy("pri"))


JOIN_DERIVED_PRUNED_SQL = """
WITH b AS (SELECT MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey))
                  // 4 AS a,
                  MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey))
                  // 2 AS b FROM orders)
SELECT o.o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE)
         AS sum_qty,
       TRUE AS join_derived_pruned
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey, b
WHERE o.o_orderkey BETWEEN b.a AND b.b
GROUP BY o.o_orderpriority ORDER BY pri
"""

QUERIES["lineitem_join_derived_pruned_sql"] = (
    lineitem_join_derived_pruned_sql, JOIN_DERIVED_PRUNED_SQL)
