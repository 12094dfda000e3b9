"""Temporal join operators: as-of join and range (interval) join.

The reference has neither (SURVEY §2.3 'No range/as-of/interval joins
exist in the reference'); these are the time-series operators a
training-data/event pipeline needs, built as compositions of DataFrame
ops (SURVEY §7's guidance for operators Spark lacks):

- ``asof_join``: the union-and-carry trick — union both sides tagged,
  one window pass per key carries the latest right-side row forward,
  filter back to left rows. ONE hash shuffle on the key, no point
  lookups, no broadcast of the big side; this is the scalable form
  (an inequality join would plan as a nested-loop).
- ``range_join_binned``: equi-join on coarse time bins (each left row
  probes the bins its window overlaps), then exact interval filter —
  the standard bin-bucketing rewrite that turns an inequality join
  into a hash join. Bin width trades shuffle fan-out vs post-filter
  selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on, matching on ``by``. Backward as-of join.

    ``on`` must be mutually comparable (timestamp/long); ``by`` is the
    equi-key (e.g. user_id). Right columns are carried with ``suffix``.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        by, on, *[F.col(c).alias(c + suffix) for c in rcols]
    ).withColumn("__side", F.lit(0))

    # Align schemas for the union.
    for c in rcols:
        lt = lt.withColumn(c + suffix, F.lit(None).cast(
            dict(rt.dtypes)[c + suffix]))
    lcols_only = [c for c in left.columns if c not in (on, by)]
    for c in lcols_only:
        rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    order = [by, on] + lcols_only + [c + suffix for c in rcols] + ["__side"]
    u = lt.select(*order).unionByName(rt.select(*order))

    # Right rows sort before left rows at equal timestamps (__side asc)
    # so right.on == left.on matches (<= semantics).
    w = (Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("__side").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(F.when(F.col("__side") == 0, F.col(c + suffix)),
                      ignorenulls=True).over(w).alias(c + suffix)
               for c in rcols]
    return (u.select(by, on, *lcols_only, F.col("__side"), *carried)
             .where(F.col("__side") == 1)
             .drop("__side"))


def range_join_binned(left: DataFrame, right: DataFrame, by: str,
                      left_ts: str, right_ts: str,
                      lower, upper, bin_width) -> DataFrame:
    """Join rows where right_ts ∈ [left_ts + lower, left_ts + upper),
    matching on ``by``. Timestamp columns must be numeric (epoch seconds
    / micros) — cast before calling; lower/upper/bin_width in the same
    unit.

    Rewrite: right rows hash into time bins; each left row explodes to
    the bins its window overlaps; equi-join on (by, bin); exact filter.
    Shuffle volume = |right| + |left| × (window/bin_width + 1).
    """
    # Disambiguate if both sides use the same ts column name: the right
    # side's ts is exposed as <right_ts>_right in the output.
    if right_ts == left_ts:
        right = right.withColumnRenamed(right_ts, right_ts + "_right")
        right_ts = right_ts + "_right"
    l2 = left.withColumn(
        "__bin",
        F.explode(F.sequence(
            ((F.col(left_ts) + F.lit(lower)) / F.lit(bin_width)).cast("long"),
            ((F.col(left_ts) + F.lit(upper)) / F.lit(bin_width)).cast("long"))))
    r2 = right.withColumn(
        "__bin", (F.col(right_ts) / F.lit(bin_width)).cast("long"))
    cond = ((F.col(right_ts) >= F.col(left_ts) + F.lit(lower))
            & (F.col(right_ts) < F.col(left_ts) + F.lit(upper)))
    return (l2.join(r2, [by, "__bin"])
              .where(cond)
              .drop("__bin"))
