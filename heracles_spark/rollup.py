"""Incremental rollup maintenance — continuous aggregates over append-only
tables (≙ "hypertable rollup" in time-series engines; materialized-view
incremental refresh elsewhere).

The reference has no materialization surface; its users re-run the
aggregate query. At 100 TB an hourly dashboard cannot re-scan the fact
table, so this module maintains a rollup TABLE keyed by the group
columns, refreshed incrementally:

  1. ``create_rollup`` declares the spec: group columns + MERGEABLE
     aggregates (sum/count/min/max — avg is derived as sum/count at read
     time). Mergeability is what makes increments algebraically exact:
     agg(A ∪ B) = merge(agg(A), agg(B)) holds for these and does NOT for
     e.g. exact median — which is why the spec is restricted.
  2. ``refresh_rollup`` diffs the source table's file index against the
     set of files already folded in (tracked in the rollup's table
     properties), aggregates ONLY the new files, and MERGEs the partial
     aggregates into the rollup: matched groups combine (sum+sum,
     min/least, max/greatest), new groups insert. The MERGE's file-level
     copy-on-write then bounds the write cost to the rollup files whose
     key range the new groups touch.

Cost per refresh: scan of new files + one shuffle on the group key +
COW-pruned rollup rewrite — O(increment), never O(history).

Contract: the source must be APPEND-ONLY between refreshes (the file
diff is the increment). If tracked files disappear (an overwrite,
OPTIMIZE, or a COW MERGE rewrote the source), the increment is no longer
well-defined; ``refresh_rollup`` detects that and falls back to a full
rebuild — correct at any time, just not incremental. File tracking lives
in the rollup's properties as JSON; at ≫1e5 source files it graduates to
a sidecar dataset exactly like the catalog's file index (same note,
SURVEY §7.4.6).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heracles_spark.catalog import HeraclesCatalog, KeyTable

_SPEC_PROP = "rollup.spec"
_FILES_PROP = "rollup.processed_files"

# Mergeable aggregate → (spark agg fn, SQL combine template).
_MERGEABLE = {
    "sum": (F.sum, "target.{c} + source.{c}"),
    "count": (F.count, "target.{c} + source.{c}"),
    "min": (F.min, "least(target.{c}, source.{c})"),
    "max": (F.max, "greatest(target.{c}, source.{c})"),
}


def create_rollup(spark: SparkSession, catalog: HeraclesCatalog, name: str,
                  source_table: str, group_cols: list[str],
                  aggs: dict[str, tuple[str, str]],
                  group_exprs: dict[str, str] | None = None) -> KeyTable:
    """Declare a rollup of ``source_table``.

    ``aggs`` maps output column → (fn, input_col) with fn in
    sum/count/min/max. ``group_exprs`` optionally maps a group column to
    a SQL expression over the source (e.g. hour bucketing:
    ``{"hour": "date_trunc('hour', ts)"}``); group columns without an
    entry pass through by name.
    """
    for out, (fn, _col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"aggregate {fn!r} for {out!r} is not mergeable; "
                f"supported: {sorted(_MERGEABLE)} (avg = sum/count)")
    exprs = group_exprs or {}
    spec = {"source": source_table, "group_cols": list(group_cols),
            "group_exprs": exprs,
            "aggs": {k: list(v) for k, v in aggs.items()}}
    probe = _aggregate(
        spark, catalog.read_table(spark, source_table).limit(0), spec)
    cols = [(f.name, f.dataType.simpleString())
            for f in probe.schema.fields]

    tbl = catalog.create_table(name, cols, list(group_cols))
    tbl.properties[_SPEC_PROP] = json.dumps(spec)
    tbl.properties[_FILES_PROP] = json.dumps([])
    catalog._save(tbl)
    return tbl


# COUNT(*) spellings the SQL dispatcher / callers may hand us as the
# "input column" of a count aggregate (sql.py maps `*` → "1").
_COUNT_STAR = {"*", "1", ""}


def _aggregate(spark: SparkSession, df: DataFrame, spec: dict) -> DataFrame:
    exprs = spec["group_exprs"]
    groups = spec["group_cols"]

    def _is_star(fn: str, c: str) -> bool:
        return fn == "count" and (c is None or c in _COUNT_STAR)

    need = sorted({c for _out, (fn, c) in spec["aggs"].items()
                   if not _is_star(fn, c) and c not in groups})
    # COUNT(col) counts non-null values of the column (SQL semantics);
    # only COUNT(*) counts rows.
    return (df.select(
                *[F.expr(exprs.get(g, g)).alias(g) for g in groups],
                *[F.col(c) for c in need])
              .groupBy(*groups)
              .agg(*[_MERGEABLE[fn][0](F.lit(1) if _is_star(fn, c)
                                       else F.col(c)).alias(out)
                     for out, (fn, c) in spec["aggs"].items()]))


def refresh_rollup(spark: SparkSession, catalog: HeraclesCatalog,
                   name: str) -> dict:
    """Fold unprocessed source files into the rollup. Returns stats:
    {"mode": "incremental"|"rebuild"|"noop", "new_files": k}."""
    tbl = catalog.get_table(name)
    spec = json.loads(tbl.properties[_SPEC_PROP])
    done = set(json.loads(tbl.properties.get(_FILES_PROP, "[]")))
    src = catalog.get_table(spec["source"])
    current = [f["path"] for f in src.files]
    missing = done - set(current)
    new = [p for p in current if p not in done]

    from heracles_spark import writer
    from heracles_spark.merge import MergeClause, merge_into

    # The processed-file set commits IN THE SAME catalog write as the
    # rollup's data (update_file_index merges both under one _save): a
    # crash can leave the fold either fully applied+tracked or not at
    # all — never applied-but-untracked, which a later refresh would
    # fold again and double-count.
    tracked = {_FILES_PROP: json.dumps(current)}

    if missing:
        # Tracked files vanished: source was rewritten, increment is
        # undefined — rebuild from scratch (correct, not incremental).
        full = _aggregate(
            spark, catalog.read_table(spark, spec["source"]), spec)
        writer.write_key_organized(spark, catalog, name, full,
                                   mode="overwrite",
                                   commit_properties=tracked)
        mode = "rebuild"
    elif not new:
        return {"mode": "noop", "new_files": 0}
    else:
        part = _aggregate(
            spark,
            spark.read.schema(src.schema()).parquet(*sorted(new)), spec)
        on = " AND ".join(f"target.{g} = source.{g}"
                          for g in spec["group_cols"])
        combine = {out: _MERGEABLE[fn][1].format(c=out)
                   for out, (fn, _c) in spec["aggs"].items()}
        clauses = [
            MergeClause("matched", "update", assignments=combine),
            MergeClause("not_matched", "insert", assignments={"*": "*"}),
        ]
        merge_into(spark, catalog, name, part, on, clauses,
                   check_ambiguity=False,   # groupBy ⇒ unique keys
                   commit_properties=tracked)
        mode = "incremental"

    return {"mode": mode, "new_files": len(new)}
