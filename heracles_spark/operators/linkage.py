"""Record linkage: fuzzy string-similarity self-join with multi-pass
blocking — the entity-resolution primitive a corpus pipeline needs to
collapse near-identical names/titles ("red widget" vs "red gadget")
without an O(n²) all-pairs edit-distance pass.

Shape (standard blocking from the record-linkage literature, e.g.
Christen, "Data Matching", 2012):

  1. DISTINCT values of the link column (vocabulary-sized, not
     row-sized — dedup before linkage, always).
  2. For each blocking key (cheap deterministic function of the value:
     first token, last token, length bucket, phonetic code, ...) an
     equi-self-join on the key proposes candidate pairs. Multi-pass =
     UNION of the per-key candidate sets (a pair only needs to agree
     on ONE key to be proposed — recall adds up across passes).
  3. Oversized blocks ("stop blocks" — the analogue of the stop-gram
     caps in winnowing/minhash banding here) are dropped before the
     join: a block of b names proposes b² pairs, so one degenerate key
     ("", "the") must not quadratically dominate the join.
  4. The expensive exact verifier (Levenshtein) runs ONLY on the
     candidates.

Scale: the self-joins shuffle on the block key; candidate volume is
sum(b_k²) over blocks, bounded by ``block_cap``; Levenshtein is
JVM-codegen (``F.levenshtein``) on the candidate set only. Nothing is
ever all-pairs, nothing collects. The same blocking applied in the
DuckDB oracle makes the result hash-exact (edit distance has one
standard definition on both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token(c: Column) -> Column:
    return F.element_at(F.split(F.trim(c), r"\s+"), 1)


def last_token(c: Column) -> Column:
    return F.element_at(F.split(F.trim(c), r"\s+"), -1)


def fuzzy_pairs(df: DataFrame, col: str,
                blockers: list[Callable[[Column], Column]] | None = None,
                max_dist: int = 3, block_cap: int = 1000) -> DataFrame:
    """(a, b, dist) for distinct ``col`` values with Levenshtein
    distance ≤ ``max_dist`` that share at least one blocking key;
    a < b. Blocks with more than ``block_cap`` distinct values are
    dropped (stop blocks) — documented recall trade, never a
    correctness one: the contract is "pairs agreeing on a surviving
    block", exactly reproducible by an oracle applying the same rule.
    """
    if blockers is None:
        blockers = [first_token, last_token]
    names = df.select(F.col(col).alias("a")).distinct() \
              .localCheckpoint(eager=True)  # reused once per blocker
    cands = None
    for i, blk in enumerate(blockers):
        keyed = names.select("a", blk(F.col("a")).alias("__k"))
        sizes = (keyed.groupBy("__k")
                      .agg(F.count(F.lit(1)).alias("__bs"))
                      .where(F.col("__bs") <= block_cap))
        left = keyed.join(sizes.select("__k"), "__k")
        right = left.select(F.col("a").alias("b"), "__k")
        pairs = (left.join(right, "__k")
                     .where(F.col("a") < F.col("b"))
                     .select("a", "b"))
        cands = pairs if cands is None else cands.unionByName(pairs)
    return (cands.distinct()
                 .withColumn("dist", F.levenshtein("a", "b"))
                 .where(F.col("dist") <= max_dist))
