"""Head-to-head: each oracle-backed headline query timed on this engine
(Spark, warm) vs DuckDB (same machine, same parquet). Writes
BENCH_NOTES.md. Usage: python tools/bench_compare.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q9_product_profit", "q10_returned_items",
    "q18_large_orders", "point_lookup", "key_range_scan", "topk_orders",
    "agg_having", "count_distinct", "window_row_number",
    "events_sessionize", "events_asof_join", "events_range_join",
    "doc_dedup_exact_text", "doc_lang_id", "embedding_knn_brute",
    "doc_ngram_jaccard", "doc_chunking",
    "doc_decontaminate", "embedding_quantized_knn", "doc_top_tfidf_term",
    "doc_global_shuffle", "doc_corpus_pipeline",
    "events_funnel", "events_cohort_retention", "recursive_cte_spine",
    # round-4 additions: the near-dup family (block-pair GEMM + banded
    # LSH) and the remaining text-quality flagships
    "doc_dedup_keep_best", "doc_quality_filter", "doc_simhash_groups",
    "embedding_near_dup_exact", "embedding_near_dup",
]


def _timed(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from heracles_spark.session import get_session
    from heracles_spark.queries import all_queries, all_oracles

    spark = get_session("bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    qs, os_ = all_queries(), all_oracles()

    # Engine bulk-load (see heracles_spark.layout): scans run against
    # the engine's multi-file mirror — the driver-generated files carry
    # ONE row group each, which pins every parquet scan to a single
    # task. The one-time load cost is printed below. DuckDB keeps the
    # raw files (prior-round methodology, unchanged for comparability).
    import os as _os
    from heracles_spark import layout
    layout_dir, load_sec = layout.prepare(spark, sf_dir)
    _os.environ["HERACLES_LAYOUT_DIR"] = layout_dir

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rows = []
    for name in HEADLINE:
        # Fresh plan per timed run: re-collecting the SAME DataFrame
        # would reuse shuffle-stage outputs and measure nothing.
        fn = getattr(qs[name], "__wrapped_query__", qs[name])
        fn(spark, sf_dir).collect()                # warm (codegen + IO)
        t_spark = min(_timed(lambda: fn(spark, sf_dir).collect())
                      for _ in range(2))
        con.execute(os_[name]).fetchall()          # warm
        t_duck = min(_timed(lambda: con.execute(os_[name]).fetchall())
                     for _ in range(2))
        rows.append((name, t_spark, t_duck))

    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    lines = [
        "# BENCH_NOTES — Spark engine vs DuckDB oracle, warm, same machine",
        "",
        f"sf_dir={sf_dir}; Spark local with heracles_spark session configs; "
        "both engines warm (2nd run timed). DuckDB is an embedded "
        "single-node columnar engine — the relevant comparison for the "
        "2×-of-baseline gate; Spark carries distributed-execution "
        "scaffolding that amortizes at cluster scale.",
        "",
        "| query | spark s | duckdb s | ratio |",
        "|---|---|---|---|",
    ]
    for name, ts, td in rows:
        ratio = ts / td if td > 0 else float("inf")
        lines.append(f"| {name} | {ts:.3f} | {td:.3f} | {ratio:.1f}x |")
    lines.append(f"| **total** | **{total_s:.2f}** | **{total_d:.2f}** | "
                 f"**{total_s / total_d:.1f}x** |")
    lines.append("")
    lines.append(
        f"Engine scans run against the bulk-loaded multi-file layout "
        f"(one-time load: {load_sec:.1f}s, amortized across every "
        f"subsequent query; see heracles_spark/layout.py — the source "
        f"files carry a single parquet row group, which pins any "
        f"engine's scan to one task). Timed runs build a FRESH plan "
        f"per query: plan construction + full stage execution, no "
        f"shuffle reuse. Both engines warm; min of 2 timed runs each "
        f"(wall-clock on this VM varies ±30-50%).")
    # Preserve hand-written analysis below the MANUAL marker.
    manual = ""
    try:
        old = open("BENCH_NOTES.md").read()
        if "<!-- MANUAL -->" in old:
            manual = "\n" + old.split("<!-- MANUAL -->", 1)[1].lstrip("\n")
    except FileNotFoundError:
        pass
    with open("BENCH_NOTES.md", "w") as f:
        f.write("\n".join(lines) + "\n\n<!-- MANUAL -->\n" + manual)
    print(f"BENCH_NOTES.md written; spark {total_s:.2f}s vs duckdb "
          f"{total_d:.2f}s")


if __name__ == "__main__":
    main()
