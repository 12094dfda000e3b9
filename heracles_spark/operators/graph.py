"""Connected components over a pair/edge DataFrame — the transitive-
closure upgrade for near-dup dedup (SCALE.md gap #2): duplicate PAIRS
form clusters; every member must map to one representative, not just
pairwise losers.

Two algorithms:

- ``algorithm='star'`` (default): alternating large-star / small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14). Converges in O(log n) rounds regardless of
  component diameter and keeps the edge set monotonically contracting —
  the scale-correct choice when duplicate chains can be long (crawl
  mirrors, boilerplate families at 100 TB corpus scale).
- ``algorithm='label'``: min-label propagation (each node takes the min
  label in its neighborhood; iterate to fixpoint). Rounds ∝ component
  diameter — fine for LSH near-dup clusters, which are near-cliques
  with diameter ≤ ~3, and each round is one join + one aggregation.

Both shuffle on node id per round; every round's edge set is persisted
and the previous generation unpersisted, so iteration N doesn't
re-evaluate the whole lineage. Convergence checks are one tiny
aggregate action per round (count + order-independent xxhash64 sum of
the edge set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 10,
                         algorithm: str = "star",
                         strict: bool = True,
                         collect_threshold: int = 100_000) -> DataFrame:
    """Returns (id, component) where component = min node id reachable.

    ``edges`` is undirected input (src, dst); self-loops and duplicates
    are tolerated.

    Convergence contract (changed in round 7, documented + escape
    hatch in round 8): with ``algorithm='label'`` and ``strict=True``
    (the default), non-convergence within ``max_iter`` rounds RAISES
    RuntimeError — unconverged labels are silently wrong (split
    components), not approximate, so returning them by default was a
    correctness bug. Callers that pinned a small ``max_iter`` and
    relied on the old return-anyway behavior can pass
    ``strict=False``, which returns the labels with an extra boolean
    ``converged`` column (constant per run) instead of raising.
    ``algorithm='star'`` converges in O(log n) rounds and is
    unaffected in practice.

    ``collect_threshold`` (star only) bounds the driver-side FINISH:
    the distributed contraction keeps running until the surviving
    edge count — measured AFTER a contraction round, never the input
    size — drops to the threshold, at which point one bounded collect
    closes the tail (see ``_star_components``). ``0`` disables the
    finish entirely (pure distributed to fixpoint); round-12 pins
    both paths equal on a >100k-edge graph.
    """
    if algorithm == "star":
        out = _star_components(edges, src, dst, max_iter=max(max_iter, 20),
                               collect_threshold=collect_threshold)
        if not strict:
            out = out.withColumn("converged", F.lit(True))
        return out
    # Materialize the symmetric edge set ONCE (eager localCheckpoint):
    # every propagation round joins against it, and without the cut
    # each round would re-derive the whole upstream pipeline (e.g. an
    # LSH candidate generation) — and plan with no size statistics,
    # which at scale drives Spark to broadcast a relation it badly
    # misestimates (observed: broadcast OOM on a 200k-edge graph whose
    # un-materialized plan was guessed tiny).
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
                .union(edges.select(F.col(dst).alias("u"),
                                    F.col(src).alias("v")))
                .distinct()
                .localCheckpoint(eager=True))
    labels = (sym.select("u").distinct()
                 .select(F.col("u").alias("id"), F.col("u").alias("component")))
    converged = False
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' labels and own
        neigh = (sym.join(labels, sym.v == labels.id)
                    .select(F.col("u").alias("id"),
                            F.col("component").alias("cand")))
        new_labels = (labels.select("id", F.col("component").alias("cand"))
                            .union(neigh)
                            .groupBy("id")
                            .agg(F.min("cand").alias("component"))
                            # truncate lineage each round (see
                            # _star_components) — iterative plans grow
                            # exponentially under re-analysis otherwise
                            .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged and strict:
        # Unconverged labels are silently WRONG (not approximate): a
        # chain longer than max_iter hops leaves split components.
        raise RuntimeError(
            f"label propagation did not converge in {max_iter} rounds "
            f"(component diameter exceeds the cap) — raise max_iter or "
            f"use algorithm='star', which converges in O(log n) rounds, "
            f"or pass strict=False to get labels + a converged flag")
    if not strict:
        return labels.withColumn("converged", F.lit(converged))
    return labels


def _edge_signature(e: DataFrame) -> tuple:
    """Order-independent fingerprint of an edge set: (count, sum of
    per-edge xxhash64). One cheap aggregate action per round."""
    # decimal sum: a long sum of 2⁶³-range hashes overflows under ANSI
    r = e.agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))
               .alias("h")).collect()[0]
    return (r["n"], r["h"])


def _star_components(edges: DataFrame, src: str, dst: str,
                     max_iter: int = 20,
                     collect_threshold: int = 100_000) -> DataFrame:
    """Alternating large-star/small-star contraction.

    One round:
      large-star: every node u computes m = min(Γ(u) ∪ {u}) and rewires
        each LARGER neighbor v > u to m — long chains collapse toward
        their minimum without growing any neighborhood.
      small-star: orient edges toward the smaller endpoint (a > b),
        every node a rewires ALL its smaller neighbors (and itself) to
        its minimum — components finish as stars rooted at their min id.

    Fixpoint: the oriented edge set stops changing; each (child, root)
    edge then IS the component assignment.

    SMALL-GRAPH FINISH: the contracted edge set shrinks geometrically,
    and each distributed round costs 2 shuffles + a checkpoint + an
    action regardless of size — on the shrunken tail that is pure
    per-round overhead. Once the surviving edge count (already known
    from the per-round signature action) drops to ``collect_threshold``
    (a bounded collect, ~16 bytes/edge — the k-means-sample memory
    discipline), the closure finishes driver-side with one min-rooted
    union-find pass; result identical, measured 2-4 fewer Spark rounds
    on near-dup graphs. 0 disables (pure distributed; tests pin
    equality of the two paths)."""
    nodes = (edges.select(F.col(src).alias("id"))
                  .union(edges.select(F.col(dst).alias("id")))
                  .distinct())

    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
              .where(F.col("u") != F.col("v"))
              .distinct())

    prev_sig = None
    for _ in range(max_iter):
        # --- large-star ---
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
                   .select("u", F.least("u", "mv").alias("m")))
        large = (sym.join(mins, "u")
                    .where(F.col("v") > F.col("u"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                    .where(F.col("u") != F.col("v"))
                    .distinct())

        # --- small-star (on the large-star output, oriented a > b) ---
        oriented = (large.select(F.greatest("u", "v").alias("a"),
                                 F.least("u", "v").alias("b"))
                         .where(F.col("a") != F.col("b"))
                         .distinct())
        minsb = oriented.groupBy("a").agg(F.min("b").alias("m"))
        small = (oriented.join(minsb, "a")
                         .select(F.col("b").alias("u"), F.col("m").alias("v"))
                         .where(F.col("u") != F.col("v"))
                         .union(minsb.select(F.col("a").alias("u"),
                                             F.col("m").alias("v")))
                         .distinct()
                         # TRUNCATE lineage, don't just cache: with
                         # persist() alone the logical plan doubles every
                         # round and Catalyst analysis goes exponential.
                         # (On a cluster use spark.checkpoint() with a
                         # checkpoint dir for executor-loss resilience.)
                         .localCheckpoint(eager=True))

        sig = _edge_signature(small)
        e = small
        if sig == prev_sig:
            break
        if collect_threshold and sig[0] <= collect_threshold:
            # bounded driver finish: one union-find pass, roots pinned
            # to each merged set's MIN id (attach the larger root under
            # the smaller), so mapping == the distributed fixpoint.
            rows = [(r["u"], r["v"]) for r in small.collect()]
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:      # path compression
                    parent[x], x = r, parent[x]
                return r

            for u, v in rows:
                ru, rv = find(u), find(v)
                if ru != rv:
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
            seen = {x for uv in rows for x in uv}
            mapping = [(x, find(x)) for x in sorted(seen)]
            e = edges.sparkSession.createDataFrame(mapping, e.schema)
            break
        prev_sig = sig

    # Fixpoint edges point child → root (u > v == component min).
    mapping = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    labels = (nodes.join(mapping, "id", "left")
                   .select("id", F.coalesce("component", "id")
                                  .alias("component")))
    return labels


def dedup_keep_representatives(df: DataFrame, pairs: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per connected duplicate cluster: transitive
    closure of the pair set, drop everything except each component's
    representative."""
    comp = connected_components(pairs, "id_a", "id_b")
    losers = (comp.where(F.col("id") != F.col("component"))
                  .select(F.col("id").alias(id_col)))
    return df.join(losers, on=id_col, how="left_anti")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str = "w", damping: float = 0.85,
             n_iter: int = 5) -> DataFrame:
    """Weighted PageRank, fixed iteration count — the second iterative
    graph operator (after connected components), in the repo's
    engine-exact style: per-edge contribution rank(u)/outw(u)·w(u,v) is
    two correctly-rounded double ops, per-node sums accumulate in
    DECIMAL (order-free exact — any engine, any partitioning), and the
    damping update is two more double ops. A SQL oracle replaying the
    same K iterations reproduces every rank bit-for-bit, so the whole
    trajectory sits under a full value hash.

    Dangling nodes keep only the teleport term (mass leaks — the
    standard simplification; both engine and oracle do the same).

    Scale: per iteration ONE hash join on src + one combinable agg on
    dst; ranks relation = node count; lineage truncated per round (the
    connected-components discipline). Driver work = one node count."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                      F.col(weight).cast("double").alias("w"))
              .localCheckpoint(eager=True))
    nodes = (e.select(F.col("u").alias("node"))
              .union(e.select(F.col("v").alias("node")))
              .distinct()
              .localCheckpoint(eager=True))
    n = nodes.count()
    outw = e.groupBy("u").agg(F.sum("w").alias("outw"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (e.join(ranks, e.u == ranks.node)
                    .join(outw, "u")
                    .select(F.col("v").alias("node"),
                            (F.col("rank") / F.col("outw") * F.col("w"))
                            .cast("decimal(38,18)").alias("c")))
        sums = (contrib.groupBy("node")
                       .agg(F.sum("c").cast("double").alias("s")))
        ranks = (nodes.join(sums, "node", "left")
                      .select("node",
                              (F.lit((1.0 - damping) / n)
                               + F.lit(damping)
                               * F.coalesce(F.col("s"), F.lit(0.0)))
                              .alias("rank"))
                      .localCheckpoint(eager=True))
    return ranks


def triangle_count(edges: DataFrame, src: str = "u",
                   dst: str = "v") -> DataFrame:
    """Global triangle count over an undirected edge set — the
    clustering-structure primitive (graph density audits, community
    cohesion, spam-graph detection over link/co-occurrence graphs).

    Algorithm (Suri & Vassilvitskii, "Counting Triangles and the
    Curse of the Last Reducer", WWW'11): orient every edge from its
    (degree, id)-smaller endpoint to the larger; each triangle then
    has EXACTLY one node whose two triangle edges both point out (its
    ≺-minimum), so counting (wedge out-of-x, closing edge) pairs
    counts each triangle once. The orientation is the scale trick:
    out-degree under the degree order is O(sqrt(m)) for any graph
    (arboricity bound), so the wedge join's fan-out is bounded even
    when the raw degree distribution has 10^8-follower hubs — an
    id-ordered orientation would square the max degree instead.

    Shape: canonical edge set (a<b, distinct) built once and reused
    (checkpointed); degrees from one combinable agg; wedges = one
    self-equi-join of the oriented set on the pivot; triangles = one
    equi-join of wedges against the canonical set. All equi-joins —
    no theta/cartesian anywhere.

    Returns a single row (n_nodes, n_edges, n_triangles).
    """
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
              .where(F.col("a") != F.col("b"))
              .distinct()
              .localCheckpoint(eager=True))   # reused 3× below
    deg = (e.select(F.col("a").alias("n"))
            .union(e.select(F.col("b").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    ed = (e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")),
                 "a")
           .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")),
                 "b"))
    fwd = (F.col("da") < F.col("db")) | \
          ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("y"))
    # wedge (y, z): two out-neighbors of the same pivot, id-ordered so
    # the closing lookup hits the canonical (min, max) edge key
    o2 = oriented.select(F.col("x").alias("x2"), F.col("y").alias("z"))
    wedges = (oriented.join(o2, oriented.x == o2.x2)
                      .where(F.col("y") < F.col("z"))
                      .select(F.col("y").alias("a"), F.col("z").alias("b")))
    tri = wedges.join(e, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(tri)
