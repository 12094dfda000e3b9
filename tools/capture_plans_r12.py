"""Capture plans/r12/<query>_before.txt and _after.txt for the queries
whose access path changed in round 12.

Method: run each registry query function twice and spy on every
statement dispatched through HeraclesSession.sql:

* AFTER  = current engine (round-12 routing live): the dispatched
  statement's `explain formatted` plus the session's access-path audit
  (`last_select_route`: route name, files_read/files_total, …).
* BEFORE = identical statement with the round-12 routers disabled
  (`sql._route_select` and `sql._prune_join_refs` monkeypatched to
  decline), i.e. the stock-Spark plan over the full registered views —
  exactly what the round-11 engine executed for these shapes. For the
  LATERAL batch-ANN statement stock Spark cannot plan at all; the
  BEFORE file records the AnalysisException.

Usage: python tools/capture_plans_r12.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, ".")

CAPTURED = [
    "lineitem_star_join_pruned_sql",
    "orders_range_metadata_count",
    "embedding_ann_lateral_filtered",
    "lineitem_fallback_pruned_sql",
    "lineitem_cte_pruned_sql",
    "customer_subquery_pruned_sql",
    "lineitem_union_pruned_sql",
    "embedding_ann_sql_filtered",
]

# Only dispatched SELECT/WITH statements are interesting; table setup
# (CREATE/LOAD) is noise.
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


def _run(name, fn, spark, sf_dir, disable_routes):
    from heracles_spark import sql as hsql

    records = []
    restore_spy = _spy_records(records)
    saved = {}
    if disable_routes:
        saved["_route_select"] = hsql._route_select
        saved["_prune_join_refs"] = hsql._prune_join_refs
        hsql._route_select = lambda session, statement: None
        hsql._prune_join_refs = (
            lambda session, statement, **kw: None)
    fail = None
    try:
        fn(spark, sf_dir).collect()
    except Exception:
        fail = traceback.format_exc(limit=3)
    finally:
        restore_spy()
        for k, v in saved.items():
            setattr(hsql, k, v)
    return records, fail


def _write(path, name, mode_label, records, fail):
    with open(path, "w") as f:
        f.write(f"# {name} — {mode_label}\n")
        f.write("# captured by tools/capture_plans_r12.py; "
                "sf0.01 data; one section per dispatched statement\n\n")
        if not records:
            f.write("(no dispatched SELECT statements captured)\n")
        for i, r in enumerate(records):
            f.write(f"## statement {i + 1}\n{r['stmt'].strip()}\n\n")
            if r["route"]:
                f.write(f"## access-path audit (last_select_route)\n"
                        f"{r['route']}\n\n")
            if r["err"]:
                f.write(f"## dispatch error (stock Spark cannot plan "
                        f"this statement)\n{r['err']}\n\n")
            if r["plan"]:
                f.write(f"## explain formatted\n{r['plan']}\n\n")
        if fail:
            f.write(f"## query function outcome\n{fail}\n")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or CAPTURED
    os.makedirs("plans/r12", exist_ok=True)

    from heracles_spark.session import get_session
    from heracles_spark.queries import all_queries

    spark = get_session("plan-capture-r12")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    for name in names:
        fn = getattr(registry[name], "__wrapped_query__", registry[name])
        for mode_label, disable in (("after (round-12 engine)", False),
                                    ("before (round-12 routers disabled = "
                                     "round-11 path for these shapes)", True)):
            records, fail = _run(name, fn, spark, sf_dir, disable)
            suffix = "before" if disable else "after"
            path = f"plans/r12/{name}_{suffix}.txt"
            _write(path, name, mode_label, records, fail)
            print(f"wrote {path}: {len(records)} statements"
                  + (" (query fn raised)" if fail else ""))


if __name__ == "__main__":
    main()
