"""Split a query's fresh-run cost into plan-build vs execution.
Usage: python tools/profile_query.py q1_pricing_summary [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from heracles_spark.session import get_session
    from heracles_spark.queries import all_queries

    spark = get_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[name]
    raw = getattr(fn, "__wrapped_query__", fn)

    # warm: codegen + IO caches
    raw(spark, sf_dir).collect()
    for i in range(reps):
        t0 = time.time()
        df = raw(spark, sf_dir)
        t1 = time.time()
        df.collect()
        t2 = time.time()
        print(f"rep{i}: build={t1-t0:.3f}s exec={t2-t1:.3f}s "
              f"total={t2-t0:.3f}s")


if __name__ == "__main__":
    main()
