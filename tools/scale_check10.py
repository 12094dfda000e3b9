"""sf10 scale check: synthesize sf10 (10× sf1_synth = 100× the sf0.1
gate data) by FK-consistent key-shifted replication of sf1_synth —
the same construction scale_check.py uses for sf1 — and measure how a
representative query subset scales sf1 → sf10. A plan that holds
should stay ≲10× for 10× rows (usually much less on 32 cores); a
superlinear ratio flags a plan that would not survive the next decade.

The planted-quadratic near-dup family is excluded by default (its TRUE
output grows ~100× per decade BY CONSTRUCTION — r5 notes); one member
can be requested explicitly.

Usage: python tools/scale_check10.py [--regen] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from tools.scale_check import DEST as SF1
from tools.scale_check import K

DEST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".layout", "sf10_synth")
REPLICAS = 10
SHIFT = 10 * K          # sf1 already uses namespaces i*K, i<10

QUERIES = [
    "q1_pricing_summary", "q6_forecast_revenue", "q18_large_orders",
    "agg_having", "count_distinct", "topk_orders", "point_lookup",
    "events_sessionize", "events_asof_join", "events_funnel",
    "doc_dedup_exact_text", "doc_lang_id", "doc_corpus_pipeline",
    "doc_kn_bigram_lm", "doc_decontaminate",
    "embedding_knn_brute", "embedding_kmeans_step",
    "lineitem_percentile_cont", "lineitem_quantile_disc",
    "events_theil_sen_trend",
]


def _gen(spark) -> None:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t0 = time.time()
    r = spark.read.parquet

    def _union(dfs):
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def shift(col, j):
        return (F.col(col) + F.lit(j * SHIFT)).alias(col)

    for t in ("region", "nation"):
        r(f"{SF1}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DEST}/{t}.parquet")

    plans = {
        "supplier": (["s_suppkey"], 16),
        "part": (["p_partkey"], 16),
        "customer": (["c_custkey"], 16),
        "orders": (["o_orderkey", "o_custkey"], 32),
        "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 64),
    }
    for t, (keys, n) in plans.items():
        df = r(f"{SF1}/{t}.parquet")
        _union([df.select(*[shift(k, j) for k in keys],
                          *[c for c in df.columns if c not in keys])
                for j in range(REPLICAS)]
               ).repartition(n).write.mode("overwrite").parquet(
            f"{DEST}/{t}.parquet")

    ev = r(f"{SF1}/events.parquet")
    idc = [c for c in ("event_id", "user_id", "device_id",
                       "session_hint") if c in ev.columns]
    _union([ev.select(*[shift(c, j) for c in idc],
                      *[c for c in ev.columns if c not in idc])
            for j in range(REPLICAS)]
           ).repartition(64).write.mode("overwrite").parquet(
        f"{DEST}/events.parquet")

    docs = r(f"{SF1}/documents.parquet")
    _union([docs.select(shift("doc_id", j),
                        F.concat(F.col("text"), F.lit(f" zw{j}"))
                         .alias("text"),
                        *[c for c in docs.columns
                          if c not in ("doc_id", "text")])
            for j in range(REPLICAS)]
           ).repartition(64).write.mode("overwrite").parquet(
        f"{DEST}/documents.parquet")

    emb = r(f"{SF1}/embeddings.parquet")
    _union([emb.select(shift("vec_id", j),
                       F.expr(f"transform(embedding, (x, i) -> x + "
                              f"CASE WHEN i = 1 THEN CAST({j} AS FLOAT)"
                              f" * 0.01F ELSE 0.0F END)")
                        .alias("embedding"),
                       *[c for c in emb.columns
                         if c not in ("vec_id", "embedding")])
            for j in range(REPLICAS)]
           ).repartition(32).write.mode("overwrite").parquet(
        f"{DEST}/embeddings.parquet")
    print(f"generated sf10_synth in {time.time() - t0:.1f}s",
          file=sys.stderr)


def _t(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def main() -> None:
    from heracles_spark.queries import all_queries
    from heracles_spark.session import get_session

    names = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or QUERIES
    spark = get_session("scale-check-10", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if "--regen" in sys.argv or not os.path.exists(
            f"{DEST}/lineitem.parquet/_SUCCESS"):
        _gen(spark)

    qs = all_queries()
    print("| query | sf1 s | sf10 s | ratio |")
    print("|---|---|---|---|")
    tot1 = tot10 = 0.0
    for name in names:
        fn = getattr(qs[name], "__wrapped_query__", qs[name])
        fn(spark, SF1).collect()
        t1 = min(_t(lambda: fn(spark, SF1).collect()) for _ in range(2))
        fn(spark, DEST).collect()
        t10 = min(_t(lambda: fn(spark, DEST).collect())
                  for _ in range(2))
        tot1 += t1
        tot10 += t10
        print(f"| {name} | {t1:.3f} | {t10:.3f} | "
              f"{t10 / max(t1, 1e-9):.1f}x |", flush=True)
    print(f"| **total** | **{tot1:.2f}** | **{tot10:.2f}** | "
          f"**{tot10 / max(tot1, 1e-9):.1f}x** |")


if __name__ == "__main__":
    main()
