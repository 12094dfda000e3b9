"""A/B: single-broadcast vs split-broadcast tail of the hinted CDF walk.

Round-13 second pass: with a bounds_hint, grouped_cdf attaches bucket
offsets AND group totals through ONE broadcast join (tot rides the
offsets relation as a whole-partition window column). This script
times the three lineitem order-stats bench shapes + the Theil-Sen
trend under both tails IN THE SAME JVM, interleaved rounds, noop sink
(guide §1.4), fresh plan per run, result-identity asserted first.

The legacy tail below is the round-13 wave-5 shape (commit 1fdafbc):
offsets broadcast-joined on (group, bucket), totals aggregated from
the per-bucket relation and broadcast-joined on (group) separately.

Usage: python tools/ab_cdf_broadcast_merge.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def legacy_grouped_cdf(df, group_cols, value_col, weight_col=None,
                       n_buckets=32, bounds_hint=None):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    group_cols = list(group_cols)
    w_expr = (F.count(F.lit(1)) if weight_col is None
              else F.sum(weight_col))
    vd = F.col(value_col).cast("double")
    g = (df.groupBy(*group_cols, value_col)
           .agg(w_expr.cast("long").alias("w"))
           .localCheckpoint(eager=False))
    if bounds_hint is not None:
        mn, mx = float(bounds_hint[0]), float(bounds_hint[1])
        width = max((mx - mn) / float(n_buckets), 1e-12)
        bucket = F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(
            F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), F.floor(
                (vd - F.lit(mn)) / F.lit(width))))).cast("int")
        b = g.withColumn("__b", bucket)
    else:
        raise ValueError("legacy tail is only exercised with a hint here")
    btots = b.groupBy(*group_cols, "__b").agg(F.sum("w").alias("__bw"))
    wo = (Window.partitionBy(*group_cols).orderBy("__b")
                .rowsBetween(Window.unboundedPreceding, -1))
    offs = (btots.withColumn(
                "__off", F.coalesce(F.sum("__bw").over(wo), F.lit(0)))
                 .select(*group_cols, "__b", "__off"))
    if group_cols:
        tots = btots.groupBy(*group_cols).agg(F.sum("__bw").alias("tot"))
    else:
        tots = btots.groupBy().agg(F.sum("__bw").alias("tot"))
    wl = (Window.partitionBy(*group_cols, "__b").orderBy(value_col)
                .rowsBetween(Window.unboundedPreceding, 0))
    out = (b.withColumn("__lcum", F.sum("w").over(wl))
            .join(F.broadcast(offs), group_cols + ["__b"])
            .withColumn("cum", F.col("__off") + F.col("__lcum"))
            .drop("__b", "__lcum", "__off"))
    out = (out.crossJoin(F.broadcast(tots)) if not group_cols
           else out.join(F.broadcast(tots), group_cols))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from heracles_spark import layout
    from heracles_spark.operators import orderstats
    from heracles_spark.queries import all_queries
    from heracles_spark.session import get_session

    spark = get_session("ab-cdf-merge")
    spark.sparkContext.setLogLevel("ERROR")
    layout_dir, _ = layout.prepare(spark, sf_dir)
    os.environ["HERACLES_LAYOUT_DIR"] = layout_dir

    names = ["lineitem_percentile_cont", "lineitem_quantile_disc",
             "lineitem_equidepth_hist", "events_theil_sen_trend"]
    registry = all_queries()
    fresh = {n: getattr(registry[n], "__wrapped_query__", registry[n])
             for n in names}
    merged_cdf = orderstats.grouped_cdf

    def build(name, variant):
        orderstats.grouped_cdf = variant
        try:
            return fresh[name](spark, sf_dir)
        finally:
            orderstats.grouped_cdf = merged_cdf

    # result identity gate
    for n in names:
        a = sorted(map(tuple, build(n, merged_cdf).collect()))
        b = sorted(map(tuple, build(n, legacy_grouped_cdf).collect()))
        assert a == b, f"variant results differ for {n}"
    print("identity: OK for", names)

    times = {n: {"merged": [], "legacy": []} for n in names}
    for r in range(rounds):
        for label, variant in (("merged", merged_cdf),
                               ("legacy", legacy_grouped_cdf)):
            for n in names:
                spark.sparkContext.setJobDescription(
                    f"ab-cdf-merge {label} {n} r{r}")
                df = build(n, variant)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                times[n][label].append(round(time.time() - t0, 3))
    for n in names:
        m, l = times[n]["merged"], times[n]["legacy"]
        print(f"{n}: merged min {min(m):.3f} (runs {m}) | "
              f"legacy min {min(l):.3f} (runs {l})")


if __name__ == "__main__":
    main()
