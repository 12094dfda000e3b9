"""Inverted text indexes as key-organized PROJECTION tables.

``CREATE TEXT INDEX ti ON t (col)`` materializes the postings relation
(term, <base key cols...>, tf) SORTED BY TERM via the standard
key-range writer — so a term probe is the engine's ordinary pruned
scan (file min/max on the term key), and the postings table is a
first-class queryable table: BM25 / tf-idf / boolean retrieval are
plain SQL over it (see queries.pipeline.doc_bm25_indexed for the
probe-shaped BM25). The same design rule as heracles_spark/index.py:
an index IS a key-organized table, so building it is the writer and
probing it is the pruner — no new storage machinery.

Scale: build = one explode + combinable (term, key) count + the range
shuffle every bulk load pays; size = Σ distinct (term, doc) pairs.
Rebuild on REFRESH is exact (append-only incremental refresh would
follow index.py's file-diff pattern; text corpora mutate by rewrite,
so exactness-by-rebuild is the honest default).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_PROP = "text_indexes"


def _registry(tbl) -> dict:
    return json.loads(tbl.properties.get(_PROP, "{}"))


def _commit_registry(catalog, table: str, reg: dict, op: str) -> None:
    catalog.update_file_index(table, catalog.get_table(table).files,
                              append=False, op=op,
                              properties={_PROP: json.dumps(reg)})


def _postings_name(table: str, iname: str) -> str:
    return f"{table}__tidx_{iname}"


def create_text_index(spark: SparkSession, catalog, table: str,
                      text_col: str, iname: str,
                      n_buckets: int | None = None):
    """Build (term, <key cols>, tf) postings sorted by term."""
    from heracles_spark import writer
    from heracles_spark.operators import text

    tbl = catalog.get_table(table)
    if text_col not in [c for c, _ in tbl.columns]:
        raise ValueError(f"no such column {text_col!r} on {table!r}")
    base = catalog.read_table(spark, table)
    toks = base.select(
        *tbl.key_cols,
        F.explode(text.tokens(F.col(text_col))).alias("term"))
    postings = (toks.groupBy("term", *tbl.key_cols)
                    .agg(F.count(F.lit(1)).alias("tf")))
    name = _postings_name(table, iname)
    key_types = dict(tbl.columns)
    catalog.create_table(
        name,
        [("term", "string")]
        + [(k, key_types[k]) for k in tbl.key_cols]
        + [("tf", "bigint")],
        ["term"] + list(tbl.key_cols),
        properties={"textCol": text_col, "baseTable": table})
    writer.write_key_organized(spark, catalog, name, postings,
                               mode="overwrite", n_buckets=n_buckets)
    catalog.read_table(spark, name).createOrReplaceTempView(
        catalog.view_name(name))
    reg = _registry(tbl)
    reg[iname] = {"col": text_col, "table": name,
                  "built_version": catalog.get_table(table).version + 1}
    _commit_registry(catalog, table, reg, f"create-text-index:{iname}")
    return catalog.get_table(name)


def refresh_text_index(spark: SparkSession, catalog, table: str,
                       iname: str):
    """Exact rebuild from the current base table."""
    from heracles_spark import writer
    from heracles_spark.operators import text

    tbl = catalog.get_table(table)
    name = _postings_name(table, iname)
    itbl = catalog.get_table(name)            # raises if absent
    base_cols = {c for c, _ in tbl.columns}
    text_col = (itbl.properties or {}).get("textCol", "text")
    if text_col not in base_cols:
        raise ValueError(f"indexed column {text_col!r} missing on base")
    base = catalog.read_table(spark, table)
    toks = base.select(
        *tbl.key_cols,
        F.explode(text.tokens(F.col(text_col))).alias("term"))
    postings = (toks.groupBy("term", *tbl.key_cols)
                    .agg(F.count(F.lit(1)).alias("tf")))
    writer.write_key_organized(spark, catalog, name, postings,
                               mode="overwrite")
    catalog.read_table(spark, name).createOrReplaceTempView(
        catalog.view_name(name))
    reg = _registry(catalog.get_table(table))
    if iname in reg:
        reg[iname]["built_version"] = \
            catalog.get_table(table).version + 1
        _commit_registry(catalog, table, reg,
                         f"refresh-text-index:{iname}")
    return catalog.get_table(name)


def drop_text_index(spark: SparkSession, catalog, table: str,
                    iname: str) -> None:
    catalog.drop_table(_postings_name(table, iname))
    reg = _registry(catalog.get_table(table))
    if iname in reg:
        del reg[iname]
        _commit_registry(catalog, table, reg,
                         f"drop-text-index:{iname}")
