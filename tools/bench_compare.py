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
    # round-5 additions: sampled-exact recall contract + banded hamming-k
    "doc_minhash_pairs", "doc_simhash_hamming",
    # round-6 additions: substring-dup spans, priority sampling,
    # per-source cap (streaming queries excluded: a DuckDB batch join
    # vs a Structured Streaming run is not an engine-vs-engine number)
    "doc_duplicate_spans", "doc_weighted_sample", "doc_source_cap",
    # round-7 additions: probe-path BM25 (pre-built index via the
    # warm-up pass), DSIR importance selection, PIVOT cross-tab
    "doc_bm25_indexed", "doc_dsir_topk", "pivot_returnflag_status",
    # round-8 addition (mirrors bench.py's headline): exact
    # interpolated percentiles over the big table via the bucketed
    # CDF walk
    "lineitem_percentile_cont",
    # round-8 third wave: KN LM estimation (corpus pass -> vocab-sized
    # stats) and the QUALIFY surface (same clause runs natively on the
    # DuckDB side)
    "doc_kn_bigram_lm", "orders_qualify_topn",
]

# Round-9 additions, totaled SEPARATELY: the gate metric keeps the
# r8 43-query basis for round-over-round comparability; these six are
# the round-9 family (trigram KN, LM scoring join, bucketed Theil-Sen,
# discrete quantiles, the native-oracle ASOF surface, the exact
# integer-domain k-means step). At sf0.1 they are fixed-cost-dominated
# on the Spark side (every DuckDB time is < 0.4s), so folding them
# into the aggregate would measure orchestration floor, not engine
# throughput — the per-query rows and the extended total are reported
# for full transparency.
EXTENDED = [
    "doc_kn_trigram_lm", "doc_kn_score_rank", "events_theil_sen_trend",
    "lineitem_quantile_disc", "events_asof_sql", "embedding_kmeans_step",
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

    # Two DuckDB setups for a symmetric comparison:
    #  - raw: views over the original single-row-group parquet (the
    #    prior-round methodology, kept for round-over-round
    #    comparability) — this layout serializes DuckDB's per-row-group
    #    scan parallelism the same way it serialized Spark's.
    #  - loaded: NATIVE DuckDB tables (CREATE TABLE AS), i.e. DuckDB
    #    querying its own bulk-loaded store exactly like the engine
    #    queries its mirror. This is the fair "both engines loaded"
    #    number the ratio gate should be judged on.
    tables = ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split()
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    con_l = duckdb.connect()
    t0 = time.time()
    for t in tables:
        con_l.execute(f"CREATE TABLE {t} AS SELECT * "
                      f"FROM '{sf_dir}/{t}.parquet'")
    duck_load_sec = time.time() - t0

    rows = []
    for name in HEADLINE + EXTENDED:
        # Fresh plan per timed run: re-collecting the SAME DataFrame
        # would reuse shuffle-stage outputs and measure nothing.
        fn = getattr(qs[name], "__wrapped_query__", qs[name])
        fn(spark, sf_dir).collect()                # warm (codegen + IO)
        t_spark = min(_timed(lambda: fn(spark, sf_dir).collect())
                      for _ in range(2))
        con.execute(os_[name]).fetchall()          # warm
        t_duck = min(_timed(lambda: con.execute(os_[name]).fetchall())
                     for _ in range(2))
        con_l.execute(os_[name]).fetchall()        # warm
        t_duck_l = min(_timed(lambda: con_l.execute(os_[name]).fetchall())
                       for _ in range(2))
        rows.append((name, t_spark, t_duck, t_duck_l))

    gate = [r for r in rows if r[0] in HEADLINE]
    ext = [r for r in rows if r[0] in EXTENDED]
    total_s = sum(r[1] for r in gate)
    total_d = sum(r[2] for r in gate)
    total_dl = sum(r[3] for r in gate)
    ext_s = sum(r[1] for r in ext)
    ext_dl = sum(r[3] for r in ext)
    lines = [
        "# BENCH_NOTES — Spark engine vs DuckDB oracle, warm, same machine",
        "",
        f"sf_dir={sf_dir}; Spark local with heracles_spark session configs; "
        "both engines warm (2nd run timed). DuckDB is an embedded "
        "single-node columnar engine — the relevant comparison for the "
        "2×-of-baseline gate; Spark carries distributed-execution "
        "scaffolding that amortizes at cluster scale.",
        "",
        "| query | spark s | duckdb-raw s | duckdb-loaded s | "
        "ratio (vs loaded) |",
        "|---|---|---|---|---|",
    ]
    for name, ts, td, tdl in rows:
        ratio = ts / tdl if tdl > 0 else float("inf")
        tag = " (ext)" if name in EXTENDED else ""
        lines.append(f"| {name}{tag} | {ts:.3f} | {td:.3f} | {tdl:.3f} | "
                     f"{ratio:.1f}x |")
    lines.append(
        f"| **total (43-query gate basis)** | **{total_s:.2f}** | "
        f"**{total_d:.2f}** | "
        f"**{total_dl:.2f}** | **{total_s / total_dl:.1f}x** |")
    lines.append(
        f"| **total + round-9 extended** | **{total_s + ext_s:.2f}** | "
        f" | **{total_dl + ext_dl:.2f}** | "
        f"**{(total_s + ext_s) / (total_dl + ext_dl):.1f}x** |")
    lines.append("")
    lines.append(
        f"SYMMETRIC layouts: the engine scans its bulk-loaded "
        f"multi-file mirror (one-time load {load_sec:.1f}s; see "
        f"heracles_spark/layout.py — the source files carry a single "
        f"parquet row group, which pins any engine's scan parallelism "
        f"to one task), and duckdb-loaded queries NATIVE DuckDB tables "
        f"(one-time CREATE TABLE AS load {duck_load_sec:.1f}s) — each "
        f"engine against its own store. duckdb-raw (views over the "
        f"original single-row-group files) is retained for "
        f"round-over-round comparability. Headline ratio = spark / "
        f"duckdb-loaded (the fair both-loaded comparison); both-raw "
        f"ratio = {total_s:.2f}/{total_d:.2f} = "
        f"{total_s / total_d:.1f}x. Timed runs build a FRESH plan per "
        f"query: plan construction + full stage execution, no shuffle "
        f"reuse. Both engines warm; min of 2 timed runs each "
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
