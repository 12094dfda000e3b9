"""A/B: slope bounds hint for the Theil-Sen CDF-walk rank selection.

The hinted variant derives a sound global slope range from the
span-sized hourly relation (|y2-y1| <= ymax-ymin, den >= 1) and skips
grouped_cdf's bounds pass over the distinct-slope relation. Noop-sink
per guide §1.4, fresh plan per run, interleaved base/hint rounds,
results asserted identical before timing.

Usage: python tools/ab_theilsen_hint.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def build(spark, sf_dir, use_hint: bool):
    from heracles_spark.operators.orderstats import grouped_rank_row
    from heracles_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    hourly = (e.groupBy("event_type",
                        F.expr("ts_ns div 3600000000000").alias("h"))
               .agg(F.count(F.lit(1)).alias("y"))
               .localCheckpoint())
    a = hourly.select("event_type", F.col("h").alias("h1"),
                      F.col("y").alias("y1"))
    b = hourly.select("event_type", F.col("h").alias("h2"),
                      F.col("y").alias("y2"))
    pairs = (a.join(F.broadcast(b), "event_type")
              .where(F.col("h2") > F.col("h1"))
              .select("event_type",
                      (F.col("y2") - F.col("y1")).alias("num"),
                      (F.col("h2") - F.col("h1")).alias("den"))
              .withColumn("slope",
                          F.try_divide(F.col("num").cast("double"),
                                       F.col("den").cast("double"))))
    hint = None
    if use_hint:
        from heracles_spark.operators.orderstats import spread_bounds_hint

        hint = spread_bounds_hint(hourly, "y")
    med = grouped_rank_row(pairs, ["event_type"], "slope",
                           ["num", "den"], bounds_hint=hint)
    npts = (hourly.groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("n_points")))
    return (med.join(F.broadcast(npts), "event_type")
               .select("event_type", "n_points",
                       F.col("tot").alias("n_pairs"),
                       F.col("num").alias("med_num"),
                       F.col("den").alias("med_den"),
                       F.round(F.col("num").cast("double")
                               / F.col("den").cast("double"), 9)
                        .alias("slope_per_hour"))
               .orderBy("event_type"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from heracles_spark import layout
    from heracles_spark.session import get_session

    spark = get_session("ab-theilsen")
    spark.sparkContext.setLogLevel("ERROR")
    layout_dir, _ = layout.prepare(spark, sf_dir)
    os.environ["HERACLES_LAYOUT_DIR"] = layout_dir

    base = sorted(map(tuple, build(spark, sf_dir, False).collect()))
    hinted = sorted(map(tuple, build(spark, sf_dir, True).collect()))
    assert base == hinted, "results differ with hint!"
    print(f"results identical ({len(base)} rows)")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(build(spark, sf_dir, False))
    noop(build(spark, sf_dir, True))

    times: dict = {}
    for r in range(rounds):
        for label, h in (("base", False), ("hint", True)):
            spark.sparkContext.setJobDescription(f"theilsen-{label}-r{r}")
            t0 = time.time()
            noop(build(spark, sf_dir, h))
            times.setdefault(label, []).append(round(time.time() - t0, 3))
    for label, runs in sorted(times.items()):
        print(f"{label}: min {min(runs):.3f}  runs {runs}")


if __name__ == "__main__":
    main()
