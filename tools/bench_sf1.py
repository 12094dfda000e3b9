"""sf1 head-to-head: the COMPLETE bench headline (gate basis + extended,
ONE folded basis) timed at synthetic sf1 (10× sf0.1, FK-consistent
key-shifted replicas — tools/scale_check.py generation) against
DuckDB-loaded on the SAME sf1 data, same machine.

Round-10 judge ask #1: at sf0.1 half the corpus sits on Spark's
~0.1-0.2s per-query orchestration floor, so the 2× gate partly measures
measurement physics; at sf1 the floor amortizes and every query —
including the round-9 extended family that was floor-bound at sf0.1 —
can share one basis honestly. This number is the tracked scale metric.

Layouts: Spark reads the sf1_synth directories directly (they are
Spark-written multi-file parquet — already the bulk-loaded layout;
layout.prepare is for the driver's single-row-group files). DuckDB gets
native tables via CREATE TABLE AS over the same files (the
"duckdb-loaded" methodology from tools/bench_compare.py).

Usage: python tools/bench_sf1.py [query ...]   # default: full headline
Prints a markdown table + one JSON line; paste the table into
BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb

from tools.bench_compare import EXTENDED, HEADLINE
from tools.scale_check import DEST, _gen

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


# The documented O(n²) ground-truth baseline: at sf1 (20k vectors) its
# EXACT all-pairs oracle is 2e8 pair dot-products — intractable for the
# DuckDB side (>1h observed). The scale path for near-dup is the
# banded LSH/SimHash/IVF family, all of which stay in the basis; the
# exact baseline's recall contract is certified at sf≤0.1.
SKIP_AT_SF1 = {"embedding_near_dup_exact"}
# At sf10 the key-shifted replication multiplies planted near-dup
# clusters, so the TRUE pair output of the sketch-based near-dup
# queries grows ~quadratically per decade BY CONSTRUCTION (r5/r10
# notes) — exclude the whole planted-quadratic family, same reasoning
# as scale_check10's timing subset.
SKIP_AT_SF10 = SKIP_AT_SF1 | {
    "embedding_near_dup", "doc_minhash_pairs", "doc_simhash_hamming",
    "doc_duplicate_spans", "doc_simhash_groups", "doc_ngram_jaccard"}

DUCK_TIMEOUT_S = 300.0


def _timed(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def _duck_call(con, sql: str) -> float:
    """Run one DuckDB statement with a watchdog: interrupt past
    DUCK_TIMEOUT_S so a pathological oracle can't wedge the harness."""
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(DUCK_TIMEOUT_S):
            con.interrupt()

    w = threading.Thread(target=_watch, daemon=True)
    w.start()
    try:
        t0 = time.time()
        con.execute(sql).fetchall()
        return time.time() - t0
    finally:
        done.set()


def main() -> None:
    from heracles_spark.queries import all_oracles, all_queries
    from heracles_spark.session import get_session

    names = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or (HEADLINE + EXTENDED)
    # --sf10: the SAME folded basis over .layout/sf10_synth (100x the
    # sf0.1 gate data; generate via tools/scale_check10.py first).
    sf10 = "--sf10" in sys.argv
    dest = DEST
    skip, sf_label = SKIP_AT_SF1, 1.0
    if sf10:
        from tools.scale_check10 import DEST as DEST10
        dest, skip, sf_label = DEST10, SKIP_AT_SF10, 10.0
    spark = get_session("bench-sf1", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if not sf10 and ("--regen" in sys.argv or not os.path.exists(
            f"{DEST}/lineitem.parquet/_SUCCESS")):
        _gen(spark)

    qs, os_ = all_queries(), all_oracles()

    con = duckdb.connect()
    t0 = time.time()
    for t in TABLES:
        src = f"{dest}/{t}.parquet"
        if os.path.isdir(src):
            con.execute(f"CREATE TABLE {t} AS SELECT * FROM "
                        f"read_parquet('{src}/*.parquet')")
        else:
            con.execute(f"CREATE TABLE {t} AS SELECT * FROM '{src}'")
    duck_load = time.time() - t0
    print(f"duckdb sf{sf_label:g} load: {duck_load:.1f}s",
          file=sys.stderr)

    rows = []
    for name in names:
        if name in skip:
            print(f"| {name} | excluded | excluded | — | (documented "
                  f"O(n²) exact baseline / planted-quadratic output; "
                  f"LSH/IVF are the scale path)",
                  flush=True)
            continue
        fn = getattr(qs[name], "__wrapped_query__", qs[name])
        try:
            fn(spark, dest).collect()              # warm (codegen + IO)
            t_spark = min(_timed(lambda: fn(spark, dest).collect())
                          for _ in range(2))
        except Exception as e:                     # pragma: no cover
            print(f"SPARK FAIL {name}: {e}", file=sys.stderr)
            t_spark = float("nan")
        try:
            _duck_call(con, os_[name])             # warm
            t_duck = min(_duck_call(con, os_[name]) for _ in range(2))
        except Exception as e:                     # pragma: no cover
            print(f"DUCK FAIL {name}: {e}", file=sys.stderr)
            t_duck = float("nan")
        rows.append((name, t_spark, t_duck))
        print(f"| {name} | {t_spark:.3f} | {t_duck:.3f} | "
              f"{t_spark / t_duck if t_duck else float('inf'):.1f}x |",
              flush=True)

    ok = [r for r in rows if r[1] == r[1] and r[2] == r[2]]
    tot_s = sum(r[1] for r in ok)
    tot_d = sum(r[2] for r in ok)
    print(f"| **total ({len(ok)} queries, one folded basis)** | "
          f"**{tot_s:.2f}** | **{tot_d:.2f}** | "
          f"**{tot_s / tot_d:.1f}x** |")
    print(json.dumps({
        "metric": f"sf{sf_label:g}_headline_total",
        "value": round(tot_s, 2),
        "unit": "sec", "duckdb_loaded_sec": round(tot_d, 2),
        "ratio": round(tot_s / tot_d, 2), "n_queries": len(ok),
        "duck_load_sec": round(duck_load, 1), "sf": sf_label}))


if __name__ == "__main__":
    main()
