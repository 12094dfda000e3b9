"""Serving-path plan-cache experiment (round-13 judge ask #9).

Quantifies the per-statement driver slice (py4j plan construction +
Catalyst analysis/optimization/codegen) that the session plan cache
(heracles_spark.plancache, already wired into the registry) saves a
SERVING session — without touching bench.py's fresh-plan methodology.

For each sampled query: `fresh` re-invokes the raw builder per
iteration (bench methodology: full plan construction + execution);
`cached` re-collects the SAME DataFrame object (the prepared-statement
path: Spark's QueryExecution memoizes the analyzed/optimized/physical
plan on the DataFrame, so only execution remains). The difference IS
the slice a statement cache removes. Results asserted identical.

Usage: python tools/ab_plancache_serving.py [sf_dir] [rounds] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

DEFAULT = [
    "point_lookup", "key_range_scan", "agg_having", "q3_shipping_priority",
    "q1_pricing_summary", "topk_orders", "count_distinct",
    "embedding_knn_brute", "doc_lang_id",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 5
    names = args[2:] or DEFAULT

    from heracles_spark import layout
    from heracles_spark.queries import all_queries
    from heracles_spark.session import get_session

    spark = get_session("ab-plancache")
    spark.sparkContext.setLogLevel("ERROR")
    layout_dir, _ = layout.prepare(spark, sf_dir)
    os.environ["HERACLES_LAYOUT_DIR"] = layout_dir
    registry = all_queries()

    print(f"{'query':28s} {'fresh_min':>9s} {'cached_min':>10s} "
          f"{'slice':>7s}")
    total_fresh = total_cached = 0.0
    for name in names:
        fn = registry[name]
        raw = getattr(fn, "__wrapped_query__", fn)
        # Warm: codegen/JIT + result for the identity check.
        base = raw(spark, sf_dir)
        expect = sorted(map(tuple, base.collect()))
        cached_df = raw(spark, sf_dir)   # the "prepared statement"
        got = sorted(map(tuple, cached_df.collect()))
        assert expect == got, f"{name}: cached result differs"

        fresh_runs, cached_runs = [], []
        for r in range(rounds):
            spark.sparkContext.setJobDescription(f"{name}-fresh-r{r}")
            t0 = time.time()
            raw(spark, sf_dir).collect()
            fresh_runs.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"{name}-cached-r{r}")
            t0 = time.time()
            cached_df.collect()
            cached_runs.append(time.time() - t0)
        fm, cm = min(fresh_runs), min(cached_runs)
        total_fresh += fm
        total_cached += cm
        print(f"{name:28s} {fm:9.3f} {cm:10.3f} {fm - cm:7.3f}")
    n = len(names)
    print(f"{'TOTAL':28s} {total_fresh:9.3f} {total_cached:10.3f} "
          f"{total_fresh - total_cached:7.3f}  "
          f"(avg slice {(total_fresh - total_cached) / n:.3f}s/stmt)")


if __name__ == "__main__":
    main()
