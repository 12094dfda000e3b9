"""A/B: footer-bounds hint for the CDF-walk order statistics.

Times the three order-stats bench shapes with and without a
driver-side (min, max) hint read from the parquet footers
(orderstats.parquet_footer_bounds), noop-sink per guide §1.4,
fresh plan per run, interleaved base/hint rounds to control drift,
and asserts the collected results are IDENTICAL before timing.

Usage: python tools/ab_orderstats_hint.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from heracles_spark import layout
    from heracles_spark.operators.orderstats import (
        grouped_equidepth_histogram, grouped_quantile_cont,
        grouped_quantile_disc, parquet_footer_bounds)
    from heracles_spark.queries.relational import _t
    from heracles_spark.session import get_session

    spark = get_session("ab-orderstats")
    spark.sparkContext.setLogLevel("ERROR")
    layout_dir, _ = layout.prepare(spark, sf_dir)
    os.environ["HERACLES_LAYOUT_DIR"] = layout_dir

    hint = parquet_footer_bounds(f"{sf_dir}/lineitem.parquet",
                                 "l_extendedprice")
    print("hint:", hint)

    def pcont(h):
        li = _t(spark, sf_dir, "lineitem")
        return grouped_quantile_cont(
            li.select("l_returnflag", "l_extendedprice"),
            ["l_returnflag"], "l_extendedprice",
            {"p50": 0.5, "p95": 0.95}, bounds_hint=h)

    def qdisc(h):
        li = _t(spark, sf_dir, "lineitem")
        return grouped_quantile_disc(
            li.select("l_returnflag", "l_extendedprice"),
            ["l_returnflag"], "l_extendedprice",
            {"p25": 0.25, "p50": 0.5, "p75": 0.75}, bounds_hint=h)

    def eqd(h):
        li = _t(spark, sf_dir, "lineitem")
        return grouped_equidepth_histogram(
            li.select("l_returnflag", "l_linestatus", "l_extendedprice"),
            ["l_returnflag", "l_linestatus"], "l_extendedprice", 8,
            bounds_hint=h)

    shapes = {"pcont": pcont, "qdisc": qdisc, "eqdepth": eqd}

    # Correctness gate first: identical rows with and without the hint.
    for name, fn in shapes.items():
        base = sorted(map(tuple, fn(None).collect()))
        hinted = sorted(map(tuple, fn(hint).collect()))
        assert base == hinted, f"{name}: results differ with hint!"
        print(f"{name}: results identical ({len(base)} rows)")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm-up both variants once (codegen/JIT).
    for fn in shapes.values():
        noop(fn(None))
        noop(fn(hint))

    times: dict = {}
    for r in range(rounds):
        for name, fn in shapes.items():
            for label, h in (("base", None), ("hint", hint)):
                spark.sparkContext.setJobDescription(
                    f"{name}-{label}-r{r}")
                t0 = time.time()
                noop(fn(h))
                times.setdefault((name, label), []).append(
                    round(time.time() - t0, 3))
    for (name, label), runs in sorted(times.items()):
        print(f"{name:8s} {label}: min {min(runs):.3f}  runs {runs}")


if __name__ == "__main__":
    main()
