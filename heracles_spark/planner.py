"""Statistics-consuming planner helpers — the other half of ANALYZE.

``writer.analyze_table`` / ``REFRESH STATISTICS`` persist row counts,
per-column NDV/null counts, min/max, average string lengths, and exact
equi-depth histograms in table properties. This module is what READS
them: size-estimate a table from its own catalog stats, pick a join
strategy from the estimate, and estimate predicate selectivity from the
histogram — the classic System-R loop (statistics → cardinality →
strategy), realized as Spark join hints so Catalyst still owns the
physical plan. ≙ the reference's region-statistics-driven scan/join
planning; stock Spark's CBO cannot see our catalog, so the decision is
made here and handed to Catalyst as a ``broadcast()`` hint.

Scale notes:
- The decision is METADATA-ONLY: stats live in the table properties
  already in driver memory; no data is touched before the plan runs.
  At 100 TB the win is exactly that — a dimension table whose stats say
  40 MB gets broadcast without Spark first materializing a shuffle, and
  a fact table never gets broadcast by a stale file-size heuristic.
- Estimates are conservative: a table with NO stats returns None and
  the caller falls back to Spark's own sizing (never guess-broadcast
  an unmeasured relation).
- Histogram selectivity error is bounded by one bucket's row count
  (the straddling bucket), so ``estimate_rows_leq`` is within
  max(bucket rows) of exact by construction — the contract
  ``lineitem_stats_selectivity`` certifies.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heracles_spark.catalog import HeraclesCatalog, KeyTable

# Fixed in-memory widths per SQL type (bytes, parquet-decoded columnar
# estimate). Variable-length types use recorded avg_len + overhead.
_FIXED_WIDTH = {
    "boolean": 1, "tinyint": 1, "smallint": 2,
    "int": 4, "integer": 4, "float": 4, "date": 4,
    "bigint": 8, "long": 8, "double": 8, "timestamp": 8,
    "decimal": 16,
}
_VAR_OVERHEAD = 20          # UTF8String/offset+null bookkeeping
_DEFAULT_VAR_LEN = 20.0     # string column with no avg_len recorded
_DEFAULT_WIDTH = 64         # arrays/maps/unknown types

DEFAULT_BROADCAST_BYTES = 32 * 1024 * 1024


def table_stats(tbl: KeyTable) -> dict[str, Any] | None:
    """Parsed ANALYZE stats from table properties, or None if the table
    was never analyzed."""
    raw = tbl.properties.get("stats")
    return json.loads(raw) if raw else None


def column_width_bytes(sql_type: str, col_stats: dict[str, Any] | None
                       ) -> float:
    base = sql_type.lower().split("(")[0].strip()
    if base in _FIXED_WIDTH:
        return float(_FIXED_WIDTH[base])
    if base in ("string", "varchar", "char", "binary"):
        avg = (col_stats or {}).get("avg_len", _DEFAULT_VAR_LEN)
        return float(avg) + _VAR_OVERHEAD
    return float(_DEFAULT_WIDTH)


def estimated_table_bytes(tbl: KeyTable) -> int | None:
    """rows × Σ per-column width, from persisted stats only. None when
    the table has no ANALYZE stats (callers must not guess)."""
    stats = table_stats(tbl)
    if stats is None or "rows" not in stats:
        return None
    col_stats = stats.get("columns", {})
    width = sum(column_width_bytes(t, col_stats.get(c))
                for c, t in tbl.columns)
    return int(stats["rows"] * width)


def join_with_stats(spark: SparkSession, catalog: HeraclesCatalog,
                    fact: str, dim: str, on: "list[str] | Any",
                    how: str = "inner",
                    broadcast_threshold: int = DEFAULT_BROADCAST_BYTES,
                    ) -> "tuple[DataFrame, dict[str, Any]]":
    """Join two catalog tables, choosing the strategy from persisted
    ANALYZE stats: a dimension whose estimated bytes fit under
    ``broadcast_threshold`` is handed to Catalyst with a broadcast
    hint; otherwise (or when the dim was never analyzed) no hint is
    injected and Spark's own planning applies. Returns (joined
    DataFrame, decision record) so callers/tests can audit the choice.
    """
    fact_df = catalog.read_table(spark, fact)
    dim_df = catalog.read_table(spark, dim)
    est = estimated_table_bytes(catalog.get_table(dim))
    decision: dict[str, Any] = {
        "dim": dim, "est_bytes": est,
        "threshold_bytes": int(broadcast_threshold),
        "strategy": "spark-default",
    }
    if isinstance(on, list) and len(on) == 1:
        decision["est_join_rows"] = estimate_equijoin_rows(
            catalog.get_table(fact), catalog.get_table(dim), on[0], on[0])
    if est is not None and est <= broadcast_threshold:
        dim_df = F.broadcast(dim_df)
        decision["strategy"] = "broadcast"
    elif est is not None:
        decision["strategy"] = "shuffle"
    return fact_df.join(dim_df, on, how), decision


def layout_metrics(tbl: KeyTable) -> list[dict[str, Any]]:
    """Clustering-depth metrics for a table's file layout — the
    OPTIMIZE advisor (``EXPLAIN LAYOUT`` SQL surface), metadata-only
    over the per-file key-range index (no data read, O(files log
    files) driver-side sweep).

    For each key column, every file's [min, max] interval is scored by
    its OVERLAP DEPTH: how many file intervals (itself included) a
    point query inside it may have to open — the LSM-literature
    read-amplification number, and exactly what drives
    ``pruning.prune_files`` effectiveness. A freshly key-organized or
    OPTIMIZEd table is depth 1 everywhere (disjoint ranges: point
    reads open one file); every unsorted append adds a full-range
    overlap layer and depth climbs toward n_files.

    Returns one record per key column: n_files, avg/max overlap depth,
    disjoint_fraction (files overlapping nothing else), and a
    recommendation — 'optimal', 'acceptable', or the OPTIMIZE /
    OPTIMIZE ZORDER statement that would restore depth 1. At 100 TB
    this is the compaction-scheduling signal a table service polls:
    O(files) metadata, never a scan."""
    from bisect import bisect_left, bisect_right

    out: list[dict[str, Any]] = []
    for pos, col in enumerate(tbl.key_cols):
        ivs = [(f["min"][col], f["max"][col]) for f in tbl.files
               if f.get("min", {}).get(col) is not None
               and f.get("max", {}).get(col) is not None]
        if not ivs:
            continue
        n = len(ivs)
        starts = sorted(a for a, _ in ivs)
        ends = sorted(b for _, b in ivs)
        depths = []
        for mn, mx in ivs:
            # overlap count = n - (starts > mx) - (ends < mn), self incl.
            depths.append(n - (n - bisect_right(starts, mx))
                          - bisect_left(ends, mn))
        avg_d = sum(depths) / n
        max_d = max(depths)
        disjoint = sum(1 for d in depths if d == 1) / n
        if avg_d <= 1.01:
            rec = "optimal"
        elif avg_d <= 2.0:
            rec = "acceptable"
        elif pos == 0:
            rec = f"OPTIMIZE {tbl.name}"
        else:
            rec = (f"OPTIMIZE {tbl.name} ZORDER BY "
                   f"({', '.join(tbl.key_cols)})")
        out.append({"key_col": col, "n_files": n,
                    "avg_overlap_depth": round(avg_d, 3),
                    "max_overlap_depth": int(max_d),
                    "disjoint_fraction": round(disjoint, 3),
                    "recommendation": rec})
    return out


def estimate_rows_leq(tbl: KeyTable, column: str, x: float
                      ) -> float | None:
    """Estimated row count for ``column <= x`` from the persisted
    equi-depth histogram: full buckets below x plus linear
    interpolation inside the straddling bucket (its lower bound is the
    previous bucket's hi; the first bucket's is the recorded column
    min). Error ≤ the straddling bucket's row count. None when the
    column carries no histogram/min."""
    stats = table_stats(tbl)
    cst = (stats or {}).get("columns", {}).get(column)
    if not cst or "histogram" not in cst or "min" not in cst:
        return None
    lo = float(cst["min"])
    if x < lo:
        return 0.0
    est = 0.0
    for b in cst["histogram"]:
        hi = float(b["hi"])
        if x >= hi:
            est += b["rows"]
        else:
            if hi > lo:
                est += b["rows"] * (x - lo) / (hi - lo)
            break
        lo = hi
    return est


def estimate_predicate_rows(tbl: KeyTable, column: str, op: str,
                            lo: float, hi: "float | None" = None
                            ) -> float | None:
    """Estimated row count for one range predicate from the persisted
    histogram. ``op`` ∈ {"<=", "<", ">=", ">", "between"} (<=/< and
    >=/> share an estimate — a histogram sees mass up to a point, not
    AT it). NULL-aware (round-9 advisor fix): the histogram is built
    over non-null values only, so ``>`` estimates difference against
    the column's NON-NULL count, not the table total — otherwise a
    null-heavy column inflates the estimate past the one-bucket bound.
    None when the column carries no histogram."""
    stats = table_stats(tbl)
    cst = (stats or {}).get("columns", {}).get(column)
    if not cst or "histogram" not in cst or "min" not in cst:
        return None
    nonnull = float(stats["rows"]) - float(cst.get("nulls", 0))
    if op == "between":
        a = estimate_rows_leq(tbl, column, lo)
        b = estimate_rows_leq(tbl, column, float(hi))
        return None if a is None or b is None else max(0.0, b - a)
    est = estimate_rows_leq(tbl, column, lo)
    if est is None:
        return None
    if op in (">", ">="):
        est = max(0.0, nonnull - est)
    return est


def estimate_conjunction_rows(tbl: KeyTable, preds: "list[tuple]"
                              ) -> "tuple[float | None, list]":
    """Combined cardinality for a conjunction of range predicates
    under the standard independence assumption: |T| · Π sel_i, with
    sel_i = est_i / |T|. Returns (combined_estimate, per_step) where
    per_step is a list of (predicate_index, est_rows_alone) — the
    System-R composition EXPLAIN ESTIMATE surfaces per conjunct. Any
    un-estimable conjunct makes the combined estimate None (no
    guessing: a planner that cannot see one factor must not pretend
    it can see the product)."""
    stats = table_stats(tbl)
    if stats is None or "rows" not in stats:
        return None, [(i, None) for i in range(len(preds))]
    total = float(stats["rows"])
    per_step: list = []
    combined: "float | None" = total
    for i, (col, op, lo, hi) in enumerate(preds):
        est = estimate_predicate_rows(tbl, col, op, lo, hi)
        per_step.append((i, est))
        if est is None or combined is None:
            combined = None
        elif total > 0:
            combined *= est / total
    return combined, per_step


def estimate_equijoin_rows(left: KeyTable, right: KeyTable,
                           left_key: str, right_key: str
                           ) -> float | None:
    """Classic System-R equi-join cardinality estimate from persisted
    NDVs: |L| · |R| / max(ndv_L(key), ndv_R(key)) — assumes key-value
    containment, the standard CBO assumption. None unless BOTH sides
    carry ANALYZE column stats for their key (no guessing). The NDVs
    come from the mergeable HLL sketches, so the estimate stays honest
    across incremental REFRESH STATISTICS appends."""
    ls, rs = table_stats(left), table_stats(right)
    try:
        lr, rr = ls["rows"], rs["rows"]
        lndv = ls["columns"][left_key]["ndv"]
        rndv = rs["columns"][right_key]["ndv"]
    except (TypeError, KeyError):
        return None
    denom = max(int(lndv), int(rndv))
    if denom <= 0:
        return float(lr) * float(rr)
    return float(lr) * float(rr) / denom
