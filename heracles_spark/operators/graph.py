"""Connected components over a pair/edge DataFrame — the transitive-
closure upgrade for near-dup dedup (SCALE.md gap #2): duplicate PAIRS
form clusters; every member must map to one representative, not just
pairwise losers.

Algorithm: iterative label propagation (each node takes the min label in
its neighborhood; iterate to fixpoint). Each iteration is one equi-join
+ one aggregation — the standard large-scale CC shape (alternating
star contraction converges in fewer rounds; min-propagation is simpler
and bounded by component diameter, which for dedup clusters is tiny —
near-dup groups are cliques or near-cliques from LSH, diameter ≤ ~3).

Scale: edges shuffle on node id per iteration; `max_iter` bounds work;
convergence is checked with a count of changed labels (one action per
iteration — acceptable: iterations are few and the check prunes work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 10) -> DataFrame:
    """Returns (id, component) where component = min node id reachable.

    ``edges`` is undirected input (src, dst); self-loops and duplicates
    are tolerated.
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
                .union(edges.select(F.col(dst).alias("u"),
                                    F.col(src).alias("v")))
                .distinct())
    labels = (sym.select("u").distinct()
                 .select(F.col("u").alias("id"), F.col("u").alias("component")))
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' labels and own
        neigh = (sym.join(labels, sym.v == labels.id)
                    .select(F.col("u").alias("id"),
                            F.col("component").alias("cand")))
        new_labels = (labels.select("id", F.col("component").alias("cand"))
                            .union(neigh)
                            .groupBy("id")
                            .agg(F.min("cand").alias("component")))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
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
