"""Scalable global ranking / global RANGE frames.

A bare ``Window.orderBy(...)`` (no partition key) is correct but moves
the ENTIRE input into one task ("Moving all data to a single partition"
in Spark's own warning) — a plan that cannot survive a 100× scale-up.
These utilities re-express the two global-window shapes the engine
ships with as two-pass plans:

* ``with_global_ranks`` — global row ranks (and the distribution
  functions derived from them: percent_rank, cume_dist, ntile) via
  VALUE-RANGE bucketing: each row's bucket is computed from the order
  key against broadcast (min, max) bounds, local ranks are windowed
  per bucket, and per-bucket row counts (a tiny relation, one row per
  bucket) are cumulated and broadcast back as offsets. One full hash
  exchange on the bucket id + one broadcast — no global sort task, no
  driver-side action.

* ``range_frame_agg`` — a bounded value-RANGE frame (e.g. "sum over
  all rows within 500 keys back") via GHOST ROWS: the key space is
  chunked at ≥ 2× the frame width, each row is duplicated into the
  following chunk iff its frame influence crosses the boundary
  (bounded ≤ 2× duplication, ≤ 50% in practice with the default
  chunk), the frame is evaluated per chunk, and ghost copies are
  dropped from the output. Exact: every frame sees exactly one copy of
  each contributing row.

Both rewrites are RESULT-IDENTICAL to the single-partition window (the
engine's oracle queries pin this), only the physical plan changes.

Ties: ``with_global_ranks`` requires a TOTAL order (add a tiebreaker
column, as SQL windows should anyway for determinism); rank ==
row_number under a total order, which is what percent_rank/cume_dist
formulas below assume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_ranks(df: DataFrame, order_cols: list[str],
                      rn_col: str = "__rn", n_col: str = "__n",
                      n_buckets: int = 64) -> DataFrame:
    """Add global 1-based row rank ``rn_col`` and total count ``n_col``
    under the total order ``order_cols`` (first column must be numeric —
    it drives the value-range bucketing; remaining columns only break
    ties inside a bucket).

    Plan shape: broadcast (min, max) bounds → map-side bucket id → one
    hash exchange on the bucket → per-bucket sort/window → broadcast
    per-bucket offsets. Skew note: equal-width value buckets assume a
    roughly uniform order key; a pathological key distribution
    concentrates buckets (still correct, just unbalanced) — pick a
    different leading key or pre-transform in that case.

    NULL order keys get a dedicated FIRST bucket (Spark's ASC = NULLS
    FIRST window order), so they rank like the single-partition window
    would instead of silently dropping out of the bucket join
    (round-8 advisor fix)."""
    k = order_cols[0]
    bounds = df.agg(F.min(k).alias("__mn"), F.max(k).alias("__mx"))
    width = ((F.col("__mx") - F.col("__mn")).cast("double")
             / F.lit(float(n_buckets)))
    bucket = F.when(F.col(k).isNull(), F.lit(-1)).otherwise(F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col(k) - F.col("__mn")).cast("double")
            / F.greatest(width, F.lit(1e-12)))))).cast("int")
    b = (df.join(F.broadcast(bounds))
           .withColumn("__b", bucket)
           .drop("__mn", "__mx"))
    # Local ranks inside each bucket (hash exchange on __b, local sort).
    wl = Window.partitionBy("__b").orderBy(*order_cols)
    b = b.withColumn("__lrn", F.row_number().over(wl))
    # Per-bucket counts: one row per bucket — cumulating this TINY
    # relation in a single-partition window is O(n_buckets), not O(rows).
    counts = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (counts
               .withColumn("__off", F.coalesce(F.sum("__cnt").over(wo),
                                               F.lit(0)))
               .withColumn(n_col, F.sum("__cnt").over(
                   Window.orderBy("__b").rowsBetween(
                       Window.unboundedPreceding,
                       Window.unboundedFollowing)))
               .select("__b", "__off", n_col))
    return (b.join(F.broadcast(offsets), "__b")
             .withColumn(rn_col, (F.col("__off") + F.col("__lrn")))
             .drop("__b", "__lrn", "__off"))


def percent_rank_col(rn: Column, n: Column) -> Column:
    """(rank-1)/(n-1) — the SQL PERCENT_RANK under a total order."""
    return F.when(n > 1, (rn - 1).cast("double") / (n - 1).cast("double")) \
            .otherwise(F.lit(0.0))


def cume_dist_col(rn: Column, n: Column) -> Column:
    """rank/n — the SQL CUME_DIST under a total order."""
    return rn.cast("double") / n.cast("double")


def ntile_col(rn: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) from a global row rank: the first n % k buckets get
    n div k + 1 rows (Spark's and DuckDB's shared definition)."""
    q = (n / k).cast("long")           # floor division: n div k
    r = n % k
    big = r * (q + 1)                  # rows covered by the larger buckets
    return (F.when(rn <= big, ((rn - 1) / (q + 1)).cast("long") + 1)
             .otherwise(r + ((rn - big - 1) / F.greatest(q, F.lit(1)))
                        .cast("long") + 1)).cast("int")


def range_frame_agg(df: DataFrame, key_col: str, value: Column,
                    preceding: int, out_col: str,
                    agg: str = "sum", chunk: int | None = None) -> DataFrame:
    """``agg(value) OVER (ORDER BY key RANGE BETWEEN preceding PRECEDING
    AND CURRENT ROW)`` without a single-partition window.

    Chunk the key space at ``chunk`` (≥ 2× frame width; default 2×);
    a row whose influence interval [key, key+preceding] crosses its
    chunk's upper edge is duplicated ("ghost") into the next chunk, the
    frame is evaluated per chunk over own+ghost rows, and ghosts are
    dropped. Each frame sees exactly one copy of every contributing
    row, so the result equals the global window bit-for-bit."""
    chunk = chunk or 2 * preceding
    if chunk < preceding:
        raise ValueError("chunk must be >= the frame width")
    own_b = F.floor(F.col(key_col) / F.lit(chunk))
    ghost_b = F.floor((F.col(key_col) + preceding) / F.lit(chunk))
    own = df.withColumn("__b", own_b).withColumn("__ghost", F.lit(False))
    ghosts = (df.where(ghost_b > own_b)
                .withColumn("__b", ghost_b)
                .withColumn("__ghost", F.lit(True)))
    u = own.unionByName(ghosts)
    w = (Window.partitionBy("__b").orderBy(F.col(key_col))
               .rangeBetween(-preceding, Window.currentRow))
    agg_fn = getattr(F, agg)
    return (u.withColumn(out_col, agg_fn(value).over(w))
             .where(~F.col("__ghost"))
             .drop("__b", "__ghost"))


def with_global_ordered_cumsum(df: DataFrame, order_cols: list[str],
                               value: Column, out_col: str = "__cum",
                               n_buckets: int = 64,
                               descending: bool = False) -> DataFrame:
    """INCLUSIVE running sum of ``value`` under the global total order
    ``order_cols`` (first column numeric — drives the value-range
    bucketing) without a single-partition window: map-side bucket id
    from broadcast (min, max) bounds → per-bucket window cumsum (hash
    exchange on the bucket) → per-bucket TOTALS (one row per bucket)
    cumulated and broadcast back as offsets. ``value`` should be a
    decimal expression for order-free exactness. The Pareto/ABC,
    cumulative-share, and percentile-of-total family all reduce to
    this.

    NULL order keys get a dedicated bucket at the position Spark's
    window order would put them (ASC = NULLS FIRST → before bucket 0;
    DESC = NULLS LAST → after the last bucket) instead of silently
    dropping out of the bucket join (round-8 advisor fix)."""
    k = order_cols[0]
    bounds = df.agg(F.min(k).alias("__mn"), F.max(k).alias("__mx"))
    width = ((F.col("__mx") - F.col("__mn")).cast("double")
             / F.lit(float(n_buckets)))
    raw_b = F.floor((F.col(k) - F.col("__mn")).cast("double")
                    / F.greatest(width, F.lit(1e-12)))
    bucket = F.least(F.lit(n_buckets - 1),
                     F.greatest(F.lit(0), raw_b)).cast("int")
    if descending:
        bucket = (F.lit(n_buckets - 1) - bucket).cast("int")
    bucket = F.when(F.col(k).isNull(),
                    F.lit(n_buckets if descending else -1)) \
              .otherwise(bucket).cast("int")
    b = (df.join(F.broadcast(bounds))
           .withColumn("__b", bucket)
           .drop("__mn", "__mx")
           .withColumn("__v", value))
    order = [F.col(c).desc() if descending else F.col(c).asc()
             for c in order_cols]
    wl = (Window.partitionBy("__b").orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    b = b.withColumn("__lcum", F.sum("__v").over(wl))
    totals = b.groupBy("__b").agg(F.sum("__v").alias("__tot"))
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (totals.withColumn(
                   "__off", F.coalesce(F.sum("__tot").over(wo),
                                       F.lit(0).cast("decimal(38,6)")))
                     .select("__b", "__off"))
    return (b.join(F.broadcast(offsets), "__b")
             .withColumn(out_col, F.col("__off") + F.col("__lcum"))
             .drop("__b", "__v", "__lcum", "__off"))
