"""A/B: top_k pushdown below the KN LM stat joins.

base  = full type-sized joins, then orderBy+limit(20) (round-12 shape)
topk  = the count relation's (count DESC, words) head taken BEFORE the
        stat joins (round-13 operator top_k)

Rows asserted identical (sorted) before timing; collect() timed (the
bench action — the result is 20 rows, noop adds nothing), fresh plan
per run, interleaved rounds.

Usage: python tools/ab_kn_topk.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from heracles_spark import layout
    from heracles_spark.operators.text import (kneser_ney_bigram_lm,
                                               kneser_ney_trigram_lm)
    from heracles_spark.queries.relational import _t
    from heracles_spark.session import get_session

    spark = get_session("ab-kn-topk")
    spark.sparkContext.setLogLevel("ERROR")
    layout_dir, _ = layout.prepare(spark, sf_dir)
    os.environ["HERACLES_LAYOUT_DIR"] = layout_dir

    def bi(k):
        d = _t(spark, sf_dir, "documents")
        return (kneser_ney_bigram_lm(d, "text", min_len=2, top_k=k)
                .orderBy(F.desc("c12"), "w1", "w2").limit(20))

    def tri(k):
        d = _t(spark, sf_dir, "documents")
        return (kneser_ney_trigram_lm(d, "text", min_len=2, top_k=k)
                .orderBy(F.desc("c123"), "w1", "w2", "w3").limit(20))

    shapes = {"bigram": bi, "trigram": tri}
    for name, fn in shapes.items():
        base = [tuple(r) for r in fn(None).collect()]
        topk = [tuple(r) for r in fn(20).collect()]
        assert base == topk, f"{name}: results differ with top_k!"
        print(f"{name}: results identical ({len(base)} rows)")

    for fn in shapes.values():
        fn(None).collect()
        fn(20).collect()

    times: dict = {}
    for r in range(rounds):
        for name, fn in shapes.items():
            for label, k in (("base", None), ("topk", 20)):
                spark.sparkContext.setJobDescription(f"{name}-{label}-r{r}")
                t0 = time.time()
                fn(k).collect()
                times.setdefault((name, label), []).append(
                    round(time.time() - t0, 3))
    for (name, label), runs in sorted(times.items()):
        print(f"{name:8s} {label}: min {min(runs):.3f}  runs {runs}")


if __name__ == "__main__":
    main()
