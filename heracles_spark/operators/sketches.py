"""Distributed set sketches: KMV (k-minimum-values) distinct sketches.

Spark ships approx_count_distinct (HLL) but nothing for set ALGEBRA on
distinct sets — intersection/Jaccard of "users who did A" vs "users who
did B" at 100 TB without a giant distinct join. The KMV sketch fills
that: per set, keep the k smallest values of a uniform hash of the
members; then for sets A, B:

    U        = k smallest of (SA ∪ SB)         (the union's sketch)
    theta    = max(U)                          (k-th union minimum)
    est |A∪B|  = (k - 1) · H / theta           (H = hash-space size)
    est J(A,B) = |U ∩ SA ∩ SB| / k
    est |A∩B|  = est J · est |A∪B|

Everything is DETERMINISTIC — the hash is md5-derived, so the estimate
(not just an error contract) is bit-identical on any engine, run, or
partitioning, and a DuckDB oracle can reproduce it exactly.

Scale: the per-set bottom-k is a partial-aggregatable min-heap shape;
here it is a groupBy(set).window row_number ≤ k over DISTINCT member
hashes — one shuffle on the set key; sketch size k per set regardless
of cardinality. Merging sketches = k smallest of the union (associative
— the streaming/partition-merge property all sketches need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 60-bit hash space: fits a BIGINT on both engines (DuckDB reads the
# same 15 md5 hex digits), uniform enough for the (k-1)/theta estimator.
HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)


def member_hash(col) -> "F.Column":
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10) \
            .cast("long")


def kmv_sketch(df: DataFrame, set_col: str, member_col: str,
               k: int = 256) -> DataFrame:
    """(set, h) rows: the k smallest distinct member hashes per set."""
    from pyspark.sql import Window

    hashes = (df.select(F.col(set_col),
                        member_hash(member_col).alias("h"))
                .distinct())
    w = Window.partitionBy(set_col).orderBy("h")
    return (hashes.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") <= k)
                  .select(set_col, "h"))


def kmv_compare(sketch: DataFrame, set_col: str, set_a, set_b,
                k: int = 256) -> DataFrame:
    """One-row estimate frame for two sketched sets:
    (est_union, est_jaccard, est_intersection), each a pure function
    of the two hash sets — engine-independent."""
    from pyspark.sql import Window

    sa = sketch.where(F.col(set_col) == set_a).select("h")
    sb = sketch.where(F.col(set_col) == set_b).select("h")
    both = sa.intersect(sb)                      # distinct by definition
    u = (sa.union(sb).distinct()
           .withColumn("__rn", F.row_number().over(
               Window.orderBy("h")))
           .where(F.col("__rn") <= k))
    theta = u.agg(F.max("h").alias("theta"), F.count(F.lit(1)).alias("ku"))
    match = (u.join(both, "h", "left_semi")
              .agg(F.count(F.lit(1)).alias("m")))
    # Union smaller than k ⇒ the "sketch" holds the ENTIRE union and
    # the estimates degrade gracefully to exact values.
    full = F.col("ku") < k
    est_union = F.when(full, F.col("ku").cast("double")).otherwise(
        F.lit(k - 1) * F.lit(HASH_SPACE) / F.col("theta").cast("double"))
    est_j = (F.col("m").cast("double")
             / F.when(full, F.col("ku").cast("double"))
                .otherwise(F.lit(float(k))))
    # The intersection estimate multiplies the ROUNDED factors — the
    # published columns stay mutually consistent and the expression is
    # reproducible digit-for-digit from the other two outputs.
    eu = F.round(est_union, 4)
    ej = F.round(est_j, 6)
    return (theta.crossJoin(match)
                 .select(eu.alias("est_union"),
                         ej.alias("est_jaccard"),
                         F.round(ej * eu, 4).alias("est_intersection")))


def cms_counters(df: DataFrame, member_col: str, depth: int = 4,
                 width: int = 512) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the ``df``
    stream keyed by ``member_col``: ``depth`` rows of ``width``
    counters, counter[s][b] = #rows whose seeded hash lands in bucket
    b. Returns (seed, bucket, c) — at most depth·width rows regardless
    of stream size.

    One pass: each row explodes into its ``depth`` (seed, bucket)
    cells and a single hash aggregate with map-side combine does the
    counting — the map-side partials ARE partial sketches, and their
    merge IS the CMS merge (counter-wise sum), which is what makes the
    sketch streamable/shardable at 100 TB.

    The hash is md5-derived (like :func:`member_hash`) so every
    counter value is deterministic and engine-portable — a DuckDB
    oracle rebuilds the identical sketch, collisions and all.
    """
    seeds = F.array(*[F.lit(s) for s in range(depth)])
    cell = (df.select(F.explode(seeds).alias("seed"),
                      F.col(member_col).cast("string").alias("__m"))
              .select("seed",
                      (F.conv(F.substring(
                          F.md5(F.concat_ws(":", F.col("seed"),
                                            F.col("__m"))), 1, 15),
                          16, 10).cast("long") % width).alias("bucket")))
    return cell.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(counters: DataFrame, members: DataFrame,
                 member_col: str, depth: int = 4,
                 width: int = 512) -> DataFrame:
    """Point estimates for each distinct ``members`` row: est = min
    over the sketch's ``depth`` rows of the counter the member hashes
    to (0 when the cell was never hit). Guarantees est ≥ true count,
    and exceeds it only through collisions (≤ εN with ε = e/width per
    row, w.h.p. over seeds).

    The counter relation is ≤ depth·width rows — broadcast it; the
    probe side never shuffles.
    """
    seeds = F.array(*[F.lit(s) for s in range(depth)])
    probe = (members.select(F.col(member_col).cast("string").alias("__m"))
                    .distinct()
                    .select("__m", F.explode(seeds).alias("seed"))
                    .select("__m", "seed",
                            (F.conv(F.substring(
                                F.md5(F.concat_ws(":", F.col("seed"),
                                                  F.col("__m"))), 1, 15),
                                16, 10).cast("long") % width)
                            .alias("bucket")))
    return (probe.join(F.broadcast(counters), ["seed", "bucket"], "left")
                 .groupBy("__m")
                 .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                      .alias("est"))
                 .withColumnRenamed("__m", member_col))
