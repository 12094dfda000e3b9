"""2-D spatial primitives: grid-bucketed ε-join and distributed
DBSCAN — the neighbor-search patterns behind spatial joins, density
clustering, and outlier maps, built on exact INTEGER micro-coordinate
arithmetic so every distance comparison is engine-portable.

The ε-join is the canonical grid trick (e.g. Böhm et al., "Epsilon
Grid Order", SIGMOD'01 family): bucket points into ε-sized cells, and
every pair within ε must fall in the same or an adjacent cell, so a
9-cell replication equi-join enumerates a candidate superset whose
exact integer distance filter keeps precisely the true pairs — the
result is ALGORITHM-INDEPENDENT (equals brute force), which is what
lets a brute-force SQL oracle certify the grid plan.

DBSCAN (Ester et al., KDD'96) decomposes into relational steps:
ε-join → degree count → core flag → connected components over the
core-core subgraph → border attachment (min core-neighbor label,
deterministic). Each step is a bounded join/agg; the iterative part
reuses graph.connected_components (star contraction, O(log n)
rounds).

Scale: the join shuffles on cell id; per-cell population is bounded
by data density (ε sized to the question, not the data volume), and a
degenerate dense cell is AQE-skew-splittable because the join is a
plain equi-join. Candidates = Σ_cell 9·|cell|² — the 2-D analogue of
the banding/stop-gram candidate bounds used across the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor_div(c, m: int):
    # floor division for possibly-negative integer coords (Spark's
    # `div` truncates toward zero; pmod fixes the negative side)
    return ((c - F.pmod(c, F.lit(m))) / F.lit(m)).cast("long")


def grid_epsilon_join(points: DataFrame, id_col: str = "id",
                      x_col: str = "xm", y_col: str = "ym",
                      eps: int = 20000) -> DataFrame:
    """All pairs (a < b) with squared L2 distance ≤ eps² over integer
    micro-coordinates. Returns (a, b, dist2). Exactly equals the O(n²)
    brute-force pair set — the grid only prunes candidates."""
    p = points.select(F.col(id_col).alias("__id"),
                      F.col(x_col).alias("__x"),
                      F.col(y_col).alias("__y"))
    left = p.select("__id", "__x", "__y",
                    _floor_div(F.col("__x"), eps).alias("cx"),
                    _floor_div(F.col("__y"), eps).alias("cy"))
    offs = F.expr("explode(array(-1, 0, 1))")
    right = (p.select(F.col("__id").alias("__idb"),
                      F.col("__x").alias("__xb"),
                      F.col("__y").alias("__yb"),
                      _floor_div(F.col("__x"), eps).alias("bx"),
                      _floor_div(F.col("__y"), eps).alias("by"))
              .withColumn("dx", offs).withColumn("dy", offs)
              .select("__idb", "__xb", "__yb",
                      (F.col("bx") + F.col("dx")).alias("cx"),
                      (F.col("by") + F.col("dy")).alias("cy")))
    dist2 = ((F.col("__x") - F.col("__xb"))
             * (F.col("__x") - F.col("__xb"))
             + (F.col("__y") - F.col("__yb"))
             * (F.col("__y") - F.col("__yb")))
    return (left.join(right, ["cx", "cy"])
                .where(F.col("__id") < F.col("__idb"))
                .withColumn("dist2", dist2)
                .where(F.col("dist2") <= F.lit(eps) * F.lit(eps))
                .select(F.col("__id").alias("a"),
                        F.col("__idb").alias("b"), "dist2"))


def dbscan_2d(points: DataFrame, id_col: str = "id",
              x_col: str = "xm", y_col: str = "ym",
              eps: int = 20000, min_pts: int = 4) -> DataFrame:
    """DBSCAN labels over integer micro-coordinates: returns
    (id, cluster, is_core) where cluster = min member id of the
    density-connected component, border points take the MIN label
    among their core neighbors (deterministic tie-break), and noise
    gets cluster = -1. A point is core iff its ε-neighborhood
    (including itself) holds ≥ min_pts points."""
    from heracles_spark.operators.graph import connected_components

    pairs = grid_epsilon_join(points, id_col, x_col, y_col, eps) \
        .select("a", "b").localCheckpoint(eager=True)
    # sym and core_lab are each consumed by 2-3 downstream branches;
    # without materialization every branch replants the ε-join /
    # degree / CC subtrees (round-7 audit: 99 pre-AQE exchanges in the
    # plan). localCheckpoint truncates lineage at the fan-out points
    # so the plan re-derives nothing — same labels, ~10× smaller plan.
    sym = pairs.union(pairs.select(F.col("b").alias("a"),
                                   F.col("a").alias("b"))) \
        .localCheckpoint(eager=False)
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("__deg"))
    core = (deg.where(F.col("__deg") + 1 >= min_pts)
               .select(F.col("a").alias("id")))
    core_edges = (pairs
                  .join(core.select(F.col("id").alias("a")), "a")
                  .join(core.select(F.col("id").alias("b")), "b"))
    comp = connected_components(core_edges, src="a", dst="b")
    core_lab = (core.join(comp, "id", "left")
                    .select("id",
                            F.coalesce("component", "id").alias("cluster"),
                            F.lit(True).alias("is_core"))
                    .localCheckpoint(eager=False))
    border = (sym.withColumnRenamed("a", "id")
                 .join(core_lab.select(F.col("id").alias("b"),
                                       F.col("cluster").alias("__c")), "b")
                 .join(core_lab.select(F.col("id")), "id", "left_anti")
                 .groupBy("id")
                 .agg(F.min("__c").alias("cluster"))
                 .withColumn("is_core", F.lit(False)))
    labeled = core_lab.unionByName(border)
    noise = (points.select(F.col(id_col).alias("id"))
                   .join(labeled.select("id"), "id", "left_anti")
                   .select("id", F.lit(-1).cast("long").alias("cluster"),
                           F.lit(False).alias("is_core")))
    return labeled.select("id", F.col("cluster").cast("long"),
                          "is_core").unionByName(noise)
