"""bench.py methodology for a subset of headline queries: same session
factory, same mirror, same warm-up + fresh-plan timed collects, same
floor measurement — but min-of-N for chosen queries only. For isolated
re-measurement (judge ask #7) without touching bench.py.

Usage: python tools/bench_subset.py [--rounds N] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = sys.argv[1:]
    rounds = 5
    if args and args[0] == "--rounds":
        rounds = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from heracles_spark import layout
    from heracles_spark.queries import all_queries
    from heracles_spark.session import get_session

    spark = get_session("heracles-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    layout_dir, load_sec = layout.prepare(spark, sf_dir)
    os.environ["HERACLES_LAYOUT_DIR"] = layout_dir

    fresh = {n: getattr(registry[n], "__wrapped_query__", registry[n])
             for n in names}
    for n in names:
        fresh[n](spark, sf_dir).collect()

    timings, all_runs = {}, {}
    for n in names:
        runs = []
        for _ in range(rounds):
            t0 = time.time()
            fresh[n](spark, sf_dir).collect()
            runs.append(round(time.time() - t0, 3))
        all_runs[n] = runs
        timings[n] = min(runs)

    floor_src = os.path.join(sf_dir, "nation.parquet")
    floor_runs = []
    for _ in range(5):
        t0 = time.time()
        spark.read.parquet(floor_src).groupBy().count().collect()
        floor_runs.append(time.time() - t0)
    floor = sorted(floor_runs)[len(floor_runs) // 2]

    print(json.dumps({"queries": timings, "runs": all_runs,
                      "floor_per_query_sec": round(floor, 3),
                      "bulk_load_sec": round(load_sec, 3)}))


if __name__ == "__main__":
    main()
