"""Scale check: synthesize sf1 (10× sf0.1) and measure how each headline
query's runtime scales. A plan that holds should scale ~linearly in rows
(ratio ≲ 10 on 32 cores, usually much less because sf0.1 underutilizes);
a superlinear ratio flags a plan that would not survive 100 TB.

The synthetic scale-up replicates each scaling table 10× with SHIFTED
keys (FK-consistent: lineitem/orders share the order-key shift, etc.) so
join/group cardinalities scale like real data. Document texts get a
per-replica suffix and embeddings a per-replica component bump so
dedup/near-dup queries don't see 10 exact copies of everything (which
would quadratically inflate TRUE pair counts by construction rather than
by scale). region/nation stay fixed (TPC-H semantics).

Usage: python tools/scale_check.py [--regen] [query ...]
Writes the table to stdout; paste/commit into BENCH_NOTES.md manually.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
DEST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".layout", "sf1_synth")
REPLICAS = 10

QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q9_product_profit", "q18_large_orders", "agg_having",
    "count_distinct", "topk_orders", "window_row_number",
    "events_sessionize", "events_asof_join", "events_range_join",
    "events_funnel", "doc_lang_id", "doc_dedup_exact_text",
    "doc_ngram_jaccard", "doc_minhash_pairs", "doc_decontaminate",
    "doc_corpus_pipeline", "doc_pack_sequences",
    "embedding_knn_brute", "embedding_quantized_knn",
    "lineitem_skew_join",
    # round-5 additions
    "doc_simhash_hamming", "doc_dup_components",
]

# key shifts: one namespace per replica, far above any real key
K = 100_000_000


def _gen(spark) -> None:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t0 = time.time()

    def _union(dfs):
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def shift(col, i):
        return (F.col(col) + F.lit(i * K)).alias(col)

    r = spark.read.parquet

    # fixed tables: straight copies
    for t in ("region", "nation"):
        r(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DEST}/{t}.parquet")

    supplier = r(f"{SRC}/supplier.parquet")
    _union([supplier.select(shift("s_suppkey", i),
                            *[c for c in supplier.columns if c != "s_suppkey"])
            for i in range(REPLICAS)]
           ).repartition(8).write.mode("overwrite").parquet(
        f"{DEST}/supplier.parquet")

    part = r(f"{SRC}/part.parquet")
    _union([part.select(shift("p_partkey", i),
                        *[c for c in part.columns if c != "p_partkey"])
            for i in range(REPLICAS)]
           ).repartition(8).write.mode("overwrite").parquet(
        f"{DEST}/part.parquet")

    cust = r(f"{SRC}/customer.parquet")
    _union([cust.select(shift("c_custkey", i),
                        *[c for c in cust.columns if c != "c_custkey"])
            for i in range(REPLICAS)]
           ).repartition(8).write.mode("overwrite").parquet(
        f"{DEST}/customer.parquet")

    orders = r(f"{SRC}/orders.parquet")
    _union([orders.select(shift("o_orderkey", i), shift("o_custkey", i),
                          *[c for c in orders.columns
                            if c not in ("o_orderkey", "o_custkey")])
            for i in range(REPLICAS)]
           ).repartition(16).write.mode("overwrite").parquet(
        f"{DEST}/orders.parquet")

    li = r(f"{SRC}/lineitem.parquet")
    _union([li.select(shift("l_orderkey", i), shift("l_partkey", i),
                      shift("l_suppkey", i),
                      *[c for c in li.columns
                        if c not in ("l_orderkey", "l_partkey", "l_suppkey")])
            for i in range(REPLICAS)]
           ).repartition(32).write.mode("overwrite").parquet(
        f"{DEST}/lineitem.parquet")

    ev = r(f"{SRC}/events.parquet")
    idc = [c for c in ("event_id", "user_id", "device_id", "session_hint")
           if c in ev.columns]
    _union([ev.select(*[shift(c, i) for c in idc],
                      *[c for c in ev.columns if c not in idc])
            for i in range(REPLICAS)]
           ).repartition(32).write.mode("overwrite").parquet(
        f"{DEST}/events.parquet")

    docs = r(f"{SRC}/documents.parquet")
    _union([docs.select(shift("doc_id", i),
                        F.concat(F.col("text"), F.lit(f" zq{i}"))
                         .alias("text"),
                        *[c for c in docs.columns
                          if c not in ("doc_id", "text")])
            for i in range(REPLICAS)]
           ).repartition(32).write.mode("overwrite").parquet(
        f"{DEST}/documents.parquet")

    emb = r(f"{SRC}/embeddings.parquet")
    _union([emb.select(shift("vec_id", i),
                       F.expr(f"transform(embedding, "
                              f"(x, j) -> x + CASE WHEN j = 0 "
                              f"THEN CAST({i} AS FLOAT) * 0.01F "
                              f"ELSE 0.0F END)").alias("embedding"),
                       *[c for c in emb.columns
                         if c not in ("vec_id", "embedding")])
            for i in range(REPLICAS)]
           ).repartition(16).write.mode("overwrite").parquet(
        f"{DEST}/embeddings.parquet")

    print(f"generated sf1_synth in {time.time() - t0:.1f}s", file=sys.stderr)


def main() -> None:
    from heracles_spark.session import get_session
    from heracles_spark.queries import all_queries
    from heracles_spark import layout

    names = [a for a in sys.argv[1:] if not a.startswith("--")] or QUERIES
    spark = get_session("scale-check", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if "--regen" in sys.argv or not os.path.exists(
            f"{DEST}/lineitem.parquet/_SUCCESS"):
        _gen(spark)

    # sf0.1 side uses the standard bulk-load layout for a fair ratio
    d01, _ = layout.prepare(spark, SRC)

    qs = all_queries()
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    tot1 = tot10 = 0.0
    for name in names:
        fn = getattr(qs[name], "__wrapped_query__", qs[name])
        os.environ["HERACLES_LAYOUT_DIR"] = d01
        fn(spark, SRC).collect()
        t1 = min(_t(lambda: fn(spark, SRC).collect()) for _ in range(2))
        os.environ.pop("HERACLES_LAYOUT_DIR", None)
        fn(spark, DEST).collect()
        t10 = min(_t(lambda: fn(spark, DEST).collect()) for _ in range(2))
        tot1 += t1
        tot10 += t10
        print(f"| {name} | {t1:.3f} | {t10:.3f} | {t10 / max(t1, 1e-9):.1f}x |")
    print(f"| **total** | **{tot1:.2f}** | **{tot10:.2f}** | "
          f"**{tot10 / max(tot1, 1e-9):.1f}x** |")


def _t(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


if __name__ == "__main__":
    main()
