"""Eighth curation/analytics batch: directed-graph reciprocity /
trade imbalance, and audience overlap between event types.

Determinism discipline as everywhere: integer cent sums, one final
double chain mirrored op-for-op in the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.queries.relational import _events, _t

QUERIES: dict = {}


def nation_trade_reciprocity(spark, sf_dir):
    """Reciprocity of the directed nation-level trade graph: for each
    unordered nation pair with flow in BOTH directions, the exact cent
    value of each direction and the imbalance share — plus the graph-
    level reciprocity ratio (bidirectional edges / all directed
    edges) in every row. The flow aggregate is nation-pair-sized
    before any self-join (25² ceiling), so the pairing join is a
    catalog-sized operation no matter the lineitem volume."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    flows = (li.join(o.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
                     F.col("o_custkey") == F.col("c_custkey"))
               .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                     li.l_suppkey == F.col("s_suppkey"))
               .where(F.col("c_nationkey") != F.col("s_nationkey"))
               .select(F.col("c_nationkey").alias("src"),
                       F.col("s_nationkey").alias("dst"),
                       cents.alias("cents"))
               .groupBy("src", "dst")
               .agg(F.sum("cents").alias("v")))
    rev = flows.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"),
                       F.col("v").alias("v_rev"))
    both = (flows.join(rev, ["src", "dst"])
                 .where(F.col("src") < F.col("dst")))
    n_dir = flows.agg(F.count(F.lit(1)).alias("n_directed"))
    n_bi = both.agg((F.count(F.lit(1)) * 2).alias("n_bidirectional"))
    imb = (F.abs(F.col("v") - F.col("v_rev")).cast("double")
           / (F.col("v") + F.col("v_rev")).cast("double"))
    return (both.crossJoin(F.broadcast(n_dir))
                .crossJoin(F.broadcast(n_bi))
                .select(F.col("src").alias("nation_a"),
                        F.col("dst").alias("nation_b"),
                        F.col("v").alias("a_buys_from_b_cents"),
                        F.col("v_rev").alias("b_buys_from_a_cents"),
                        F.round(imb, 6).alias("imbalance"),
                        "n_directed", "n_bidirectional")
                .orderBy("nation_a", "nation_b"))


RECIPROCITY_SQL = """
WITH flows AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS v
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2),
 bi AS (
  SELECT f.src, f.dst, f.v, r.v AS v_rev
  FROM flows f JOIN flows r ON f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst),
 nd AS (SELECT COUNT(*) AS n_directed FROM flows),
 nb AS (SELECT COUNT(*) * 2 AS n_bidirectional FROM bi)
SELECT src AS nation_a, dst AS nation_b,
       v AS a_buys_from_b_cents, v_rev AS b_buys_from_a_cents,
       ROUND(CAST(ABS(v - v_rev) AS DOUBLE)
             / CAST(v + v_rev AS DOUBLE), 6) AS imbalance,
       n_directed, n_bidirectional
FROM bi, nd, nb
ORDER BY nation_a, nation_b
"""


def events_type_overlap(spark, sf_dir):
    """Audience overlap between event types: distinct-user Jaccard
    for every type pair — "do clickers also purchase?". Dedup to the
    (type, user) incidence FIRST (audience-sized, not event-sized);
    the self-join key is the user, whose fan-out is bounded by the
    type count squared — the same bounded-degree projection shape as
    the source-vocabulary and shared-part queries."""
    e = _events(spark, sf_dir)
    tu = e.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a = tu.select(F.col("event_type").alias("ta"), "user_id")
    b = tu.select(F.col("event_type").alias("tb"), "user_id")
    inter = (a.join(b, "user_id").where(F.col("ta") < F.col("tb"))
              .groupBy("ta", "tb")
              .agg(F.count(F.lit(1)).alias("inter")))
    j = (inter
         .join(sizes.select(F.col("event_type").alias("ta"),
                            F.col("sz").alias("sza")), "ta")
         .join(sizes.select(F.col("event_type").alias("tb"),
                            F.col("sz").alias("szb")), "tb"))
    jac = (F.col("inter").cast("double")
           / (F.col("sza") + F.col("szb") - F.col("inter"))
             .cast("double"))
    return (j.select("ta", "tb", "inter", "sza", "szb",
                     F.round(jac, 6).alias("jaccard"))
             .orderBy("ta", "tb"))


TYPE_OVERLAP_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
 sizes AS (SELECT event_type, COUNT(*) AS sz FROM tu GROUP BY 1),
 inter AS (
  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS inter
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT i.ta, i.tb, i.inter, x.sz AS sza, y.sz AS szb,
       ROUND(CAST(i.inter AS DOUBLE)
             / CAST(x.sz + y.sz - i.inter AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes x ON x.event_type = i.ta
JOIN sizes y ON y.event_type = i.tb
ORDER BY i.ta, i.tb
"""


QUERIES.update({
    "nation_trade_reciprocity": (nation_trade_reciprocity,
                                 RECIPROCITY_SQL),
    "events_type_overlap": (events_type_overlap, TYPE_OVERLAP_SQL),
})
