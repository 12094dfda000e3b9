"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q9_product_profit",
    "q18_large_orders",
    "point_lookup",
    "key_range_scan",
    "topk_orders",
    "agg_having",
    "count_distinct",
    "window_row_number",
    "events_sessionize",
    "join_full",
    "set_union_all",
    # pipeline / extension operators
    "doc_minhash_pairs",
    "doc_dedup_exact_text",
    "doc_lang_id",
    "embedding_knn_brute",
    "events_asof_join",
    "events_range_join",
    # corpus assembly
    "doc_corpus_mix",
    "doc_pack_sequences",
    "doc_term_frequencies",
    "doc_corpus_pipeline",
    # round 3 additions
    "doc_decontaminate",
    "embedding_quantized_knn",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from heracles_spark.session import get_session
    from heracles_spark.queries import all_queries

    spark = get_session("heracles-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # Warm-up: run every headline query once at the smallest SF. The
    # generated whole-stage-codegen source is identical across SFs (same
    # schema/plan), so this fills the codegen cache and JIT — measured
    # runs then reflect steady-state engine throughput, not one-time
    # janino compilation (~2s on the widest aggregate).
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            registry[name](spark, warm_dir).collect()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.time()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
