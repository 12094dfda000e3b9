"""Capture plans/r13/<query>_before.txt and _after.txt for the queries
whose access path changed in round 13.

Method (same spy as tools/capture_plans_r12.py): run each registry
query function twice and record every statement dispatched through
HeraclesSession.sql with its `explain formatted` and the session's
access-path audit (`last_select_route`).

* AFTER  = current engine (round-13 routing live).
* BEFORE = identical statement with ONLY the round-13 change disabled,
  i.e. exactly the round-12 engine's path for these shapes:
    - join-derived pruning off: `sql._join_edge_pairs` patched to
      return no edges (round-12 pruned only literally-attributed
      references);
    - non-key metadata stats off: `pruning` consulted with key-column
      stats only (round-12 harvested min/max for key columns alone).

Usage: python tools/capture_plans_r13.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, ".")

CAPTURED = [
    "lineitem_join_derived_pruned_sql",
    "orders_nonkey_range_metadata_count",
    "lineitem_nonkey_pruned_sql",
    "lineitem_percentile_cont",
    "lineitem_quantile_disc",
    "lineitem_equidepth_hist",
    "events_theil_sen_trend",
    "doc_kn_bigram_lm",
    "doc_kn_trigram_lm",
]

_INTERESTING = ("SELECT", "WITH")


def _spy_records(records):
    import heracles_spark.session as S

    orig = S.HeraclesSession.sql

    def spy(self, stmt):
        err = None
        df = None
        try:
            df = orig(self, stmt)
        except Exception as e:  # record, then re-raise for the caller
            err = f"{type(e).__name__}: {e}"
        head = stmt.lstrip()[:6].upper()
        if any(head.startswith(p[:6]) for p in _INTERESTING):
            rec = {"stmt": stmt,
                   "route": dict(getattr(self, "last_select_route", {})),
                   "err": err, "plan": None}
            if df is not None:
                try:
                    mode = self.spark._jvm.org.apache.spark.sql.execution \
                        .ExplainMode.fromString("formatted")
                    rec["plan"] = df._jdf.queryExecution().explainString(mode)
                except Exception as e:
                    rec["plan"] = f"<explain failed: {e}>"
            records.append(rec)
        if err is not None:
            raise RuntimeError(err)
        return df

    S.HeraclesSession.sql = spy
    return lambda: setattr(S.HeraclesSession, "sql", orig)


def _run(name, fn, spark, sf_dir, disable_r13):
    from heracles_spark import sql as hsql

    import copy

    from heracles_spark.catalog import HeraclesCatalog

    records = []
    restore_spy = _spy_records(records)
    saved = {}
    orig_get = HeraclesCatalog.get_table
    from heracles_spark.operators import orderstats as _os

    from heracles_spark.operators import text as _tx

    saved_fb = _os.parquet_footer_bounds
    saved_sb = _os.spread_bounds_hint
    saved_kn = (_tx.kneser_ney_bigram_lm, _tx.kneser_ney_trigram_lm)
    if disable_r13:
        saved["_join_edge_pairs"] = hsql._join_edge_pairs
        hsql._join_edge_pairs = lambda *a, **kw: []
        # Bounds hints off: grouped_cdf computes bounds in-plan
        # (the round-12 shape for the order-stats/Theil-Sen queries).
        _os.parquet_footer_bounds = lambda *a, **kw: None
        _os.spread_bounds_hint = lambda *a, **kw: None

        # KN top_k pushdown off: full type-sized joins, limit on top
        # (the round-12 shape).
        def _bi12(df, text_col="text", min_len=2, top_k=None):
            return saved_kn[0](df, text_col, min_len, top_k=None)

        def _tri12(df, text_col="text", min_len=2, top_k=None):
            return saved_kn[1](df, text_col, min_len, top_k=None)

        _tx.kneser_ney_bigram_lm = _bi12
        _tx.kneser_ney_trigram_lm = _tri12

        # Round-12 file index: min/max for KEY columns only, no null
        # counts — exactly what the round-12 harvest recorded, so the
        # non-key routes decline the way they did then.
        def get_table_r12(self, name):
            tbl = orig_get(self, name)
            kc = set(tbl.key_cols)
            t2 = copy.copy(tbl)
            t2.files = []
            for f in tbl.files:
                f2 = dict(f)
                f2["min"] = {k: v for k, v in f.get("min", {}).items()
                             if k in kc}
                f2["max"] = {k: v for k, v in f.get("max", {}).items()
                             if k in kc}
                f2.pop("nulls", None)
                t2.files.append(f2)
            return t2

        HeraclesCatalog.get_table = get_table_r12
    fail = None
    try:
        out_df = fn(spark, sf_dir)
        out_df.collect()
        # DataFrame-API queries never pass through HeraclesSession.sql
        # — record the returned relation's own formatted plan so the
        # evidence exists for them too (Exchange/Scan counts).
        if not records:
            try:
                mode = spark._jvm.org.apache.spark.sql.execution \
                    .ExplainMode.fromString("formatted")
                plan = out_df._jdf.queryExecution().explainString(mode)
            except Exception as e:
                plan = f"<explain failed: {e}>"
            n_ex = plan.count("Exchange")
            n_scan = plan.count("Scan parquet") + plan.count(
                "Scan ExistingRDD")
            records.append({
                "stmt": f"<DataFrame-API query {name}; plan summary: "
                        f"{n_ex} Exchange nodes, {n_scan} scans>",
                "route": {}, "err": None, "plan": plan})
    except Exception:
        fail = traceback.format_exc(limit=3)
    finally:
        restore_spy()
        HeraclesCatalog.get_table = orig_get
        _os.parquet_footer_bounds = saved_fb
        _os.spread_bounds_hint = saved_sb
        _tx.kneser_ney_bigram_lm, _tx.kneser_ney_trigram_lm = saved_kn
        for k, v in saved.items():
            setattr(hsql, k, v)
    return records, fail


def _write(path, name, mode_label, records, fail):
    with open(path, "w") as f:
        f.write(f"# {name} — {mode_label}\n")
        f.write("# captured by tools/capture_plans_r13.py; "
                "sf0.01 data; one section per dispatched statement\n\n")
        if not records:
            f.write("(no dispatched SELECT statements captured)\n")
        for i, r in enumerate(records):
            f.write(f"## statement {i + 1}\n{r['stmt'].strip()}\n\n")
            if r["route"]:
                f.write(f"## access-path audit (last_select_route)\n"
                        f"{r['route']}\n\n")
            if r["err"]:
                f.write(f"## dispatch error\n{r['err']}\n\n")
            if r["plan"]:
                f.write(f"## explain formatted\n{r['plan']}\n\n")
        if fail:
            f.write(f"## query function outcome\n{fail}\n")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or CAPTURED
    os.makedirs("plans/r13", exist_ok=True)

    from heracles_spark.session import get_session
    from heracles_spark.queries import all_queries

    spark = get_session("plan-capture-r13")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    for name in names:
        fn = getattr(registry[name], "__wrapped_query__", registry[name])
        for mode_label, disable in (
                ("after (round-13 engine)", False),
                ("before (round-13 derivation disabled = round-12 path "
                 "for these shapes)", True)):
            records, fail = _run(name, fn, spark, sf_dir, disable)
            suffix = "before" if disable else "after"
            path = f"plans/r13/{name}_{suffix}.txt"
            _write(path, name, mode_label, records, fail)
            print(f"wrote {path}: {len(records)} statements"
                  + (" (query fn raised)" if fail else ""))


if __name__ == "__main__":
    main()


