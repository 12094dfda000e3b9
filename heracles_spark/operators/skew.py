"""Hot-key skew mitigation — salting utilities.

AQE's skew-join splitting (on by default in the session factory) handles
sort-merge join skew at runtime; map-side partial aggregation handles
combinable-aggregate skew. Two shapes remain where an explicit salt is
the standard fix, and SCALE.md's analysis points here:

- ``salted_count_distinct``: per-key COUNT(DISTINCT x) concentrates every
  distinct value of a hot key in one task. Salting by HASH OF THE
  DISTINCT VALUE splits that state n_salt ways *without double counting*
  (a value's hash fixes its bucket, so each distinct value is counted in
  exactly one bucket): groupBy(key, salt) → distinct-count per bucket →
  sum per key. Two shuffles, both balanced; exact, not approximate.
- ``salted_join``: a join key so hot that one task holds the whole key's
  rows (beyond what AQE splitting can amortize). The big side gets a
  deterministic per-row salt; the small side is replicated n_salt times;
  the join runs on (key, salt), spreading the hot key over n_salt tasks.
  Replication multiplies the small side's shuffle volume by n_salt —
  the classic memory-for-balance trade, so n_salt should be ~the skew
  factor, not the cluster size.

Both are pure DataFrame compositions (codegen'd, no UDFs). The per-row
salt is xxhash64 over the row's columns — deterministic, so retries and
replays produce identical assignments (a random salt would not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(df: DataFrame, group_col: str, distinct_col: str,
                          n_salt: int = 16,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact per-key COUNT(DISTINCT distinct_col), skew-split n_salt ways.
    Returns (group_col, out_col)."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salt))
    per_bucket = (df.groupBy(F.col(group_col), salt.alias("__salt__"))
                    .agg(F.count_distinct(F.col(distinct_col))
                          .alias("__nd__")))
    return (per_bucket.groupBy(group_col)
                      .agg(F.sum("__nd__").alias(out_col)))


def salted_join(big: DataFrame, small: DataFrame, on: str,
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Join ``big`` ⋈ ``small`` on column ``on`` with the hot keys of
    ``big`` spread over ``n_salt`` tasks. Supports 'inner' and 'left'
    (the shapes where every big-side row joins at most the small side's
    matching rows; right/full would need the salt on the other side).

    The result has big's columns then small's non-join columns, like a
    plain ``big.join(small, on, how)``."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n_salt))
    b = big.withColumn("__salt__", salt)
    s = (small.withColumn(
            "__salt__",
            F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
         .withColumn("__salt__", F.col("__salt__").cast("long")))
    joined = b.join(s, [on, "__salt__"], how)
    return joined.drop("__salt__")
