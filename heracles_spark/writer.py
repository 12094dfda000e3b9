"""Key-range layout writer — the rebuild's bulk-load / insert path.

Reference behavior being re-expressed:

- ``LOAD DATA INPATH`` shuffles rows by region split keys with total key
  order, then writes HFiles (HBaseCatalog.loadTable, HBaseCatalog.scala:
  507-663; HBasePartitioner.scala:30-87). The Spark-native idiom is
  exactly ``repartitionByRange(N, *keys).sortWithinPartitions(*keys)``
  → parquet: a range shuffle + per-partition sort + columnar write.
- CSV convention: empty field ⇒ NULL (HadoopReader.scala:41-56,
  HBaseKVHelper.string2Bytes HBaseKVHelper.scala:128-145).
- Key columns are non-nullable (HBaseRelation.scala:668): rows with null
  keys are rejected.
- INSERT appends (HBaseRelation.insert with overwrite=false,
  HBaseRelation.scala:672-679). HBase's implicit per-key upsert is a
  documented divergence (SURVEY §7.2.3); ``upsert=True`` opts into
  last-write-wins dedup on the key.

After every write the per-file key ranges are harvested from parquet
footers (pyarrow, driver-side, no data read) into the catalog's file
index — the analogue of region boundary metadata
(HBaseRelation.fetchPartitions, HBaseRelation.scala:203-235).

Scale: the shuffle is one range-exchange over the load — the same cost
the reference pays in its bulk-load shuffle (HBaseShuffledRDD.scala:25-48).
Sorted-by-key parquet gives min/max stats that are disjoint across files,
which is what makes file pruning (heracles_spark.pruning) effective.
"""

from __future__ import annotations

import math
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heracles_spark.catalog import HeraclesCatalog, KeyTable

# Target rows per output file for the local harness; on a cluster you'd
# size by bytes (spark.sql.files.maxPartitionBytes governs the read side).
DEFAULT_ROWS_PER_BUCKET = 250_000


def _n_buckets(df: DataFrame, explicit: int | None) -> int:
    if explicit:
        return explicit
    try:
        n = df.count()
    except Exception:
        n = DEFAULT_ROWS_PER_BUCKET
    return max(1, math.ceil(n / DEFAULT_ROWS_PER_BUCKET))


def write_key_organized(spark: SparkSession, catalog: HeraclesCatalog,
                        table: str, df: DataFrame, mode: str = "append",
                        n_buckets: int | None = None,
                        upsert: bool = False) -> KeyTable:
    """Write ``df`` into ``table`` with key-range layout and refresh the
    file index. ``mode`` is 'append' or 'overwrite'."""
    tbl = catalog.get_table(table)
    keys = tbl.key_cols
    fields = tbl.schema().fields

    # INSERT semantics are positional (standard SQL; ≙ reference insert
    # path coercing the SELECT output to the table schema): rename by
    # position, then cast to the declared types.
    if len(df.columns) != len(fields):
        raise ValueError(
            f"column count mismatch: table {table} has {len(fields)}, "
            f"input has {len(df.columns)}")
    df = df.toDF(*[f.name for f in fields])
    df = df.select(*[F.col(f.name).cast(f.dataType) for f in fields])

    # Reject null keys (HBaseRelation.scala:668 non-nullable key columns).
    df = df.where(F.expr(" AND ".join(f"`{k}` IS NOT NULL" for k in keys)))

    if upsert:
        # HBase semantics: one row per key, last write wins. Expressed as a
        # per-key reduce — a single shuffle, map-side combinable.
        non_keys = tbl.non_key_cols()
        if non_keys:
            df = (df.groupBy(*keys)
                    .agg(*[F.last(c).alias(c) for c in non_keys])
                    .select(*[f.name for f in tbl.schema().fields]))
        else:
            df = df.dropDuplicates(keys)

    n = _n_buckets(df, n_buckets)
    laid_out = (df.repartitionByRange(n, *keys)
                  .sortWithinPartitions(*keys))
    if mode == "overwrite":
        # Stage-and-swap: the input plan may read from tbl.data_dir
        # (MERGE, INSERT ... SELECT FROM self) — overwriting a path being
        # read from is undefined in Spark. Write the new generation to a
        # sibling dir, then swap directories; readers resolve the path at
        # scan time so the next query sees the new generation.
        import shutil
        staging = tbl.data_dir.rstrip("/") + "~staging"
        shutil.rmtree(staging, ignore_errors=True)
        laid_out.write.mode("overwrite").parquet(staging)
        shutil.rmtree(tbl.data_dir, ignore_errors=True)
        os.replace(staging, tbl.data_dir)
    else:
        laid_out.write.mode(mode).parquet(tbl.data_dir)

    files = harvest_file_index(tbl.data_dir, keys)
    return catalog.update_file_index(table, files, append=False)


def bulk_load_csv(spark: SparkSession, catalog: HeraclesCatalog, table: str,
                  csv_path: str, overwrite: bool = False,
                  n_buckets: int | None = None) -> KeyTable:
    """``LOAD DATA [LOCAL] INPATH`` (HBaseCatalog.loadTable,
    HBaseCatalog.scala:507-663). Headerless CSV, empty field ⇒ NULL."""
    tbl = catalog.get_table(table)
    df = (spark.read
          .schema(tbl.schema())
          .option("header", "false")
          .option("emptyValue", None)   # empty string ⇒ NULL (HadoopReader)
          .option("nullValue", "")
          .csv(csv_path))
    return write_key_organized(
        spark, catalog, table, df,
        mode="overwrite" if overwrite else "append", n_buckets=n_buckets)


def insert_rows(spark: SparkSession, catalog: HeraclesCatalog, table: str,
                rows: list[tuple], upsert: bool = False) -> KeyTable:
    """``INSERT INTO t VALUES (...)`` (InsertValueIntoTableCommand,
    hbaseCommands.scala:62-80; string→type coercion DataTypeUtils.scala:117-135)."""
    tbl = catalog.get_table(table)
    base = tbl.schema()
    # Accept strings for any field, coerce via cast (reference coerces
    # literal strings to column types).
    from pyspark.sql import types as T
    loose = T.StructType([T.StructField(f.name, T.StringType(), True)
                          for f in base.fields])
    df = spark.createDataFrame(
        [tuple(None if v is None else str(v) for v in r) for r in rows], loose)
    return write_key_organized(spark, catalog, table, df, mode="append",
                               upsert=upsert, n_buckets=1)


def harvest_file_index(data_dir: str, key_cols: list[str]) -> list[dict[str, Any]]:
    """Per-file min/max of key columns from parquet footers (no data read).

    ≙ region boundary metadata (HBasePartition.scala:29-38). Footer stats
    are exact for the types we allow (no truncated binary stats at these
    value sizes matters only for very long strings — acceptable: pruning
    is advisory, the scan re-filters).
    """
    import pyarrow.parquet as pq

    out: list[dict[str, Any]] = []
    for root, _, names in os.walk(data_dir):
        for fn in sorted(names):
            if not fn.endswith(".parquet"):
                continue
            path = os.path.join(root, fn)
            md = pq.ParquetFile(path).metadata
            mins: dict[str, Any] = {}
            maxs: dict[str, Any] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    name = g.column(ci).path_in_schema
                    if name not in key_cols:
                        continue
                    st = g.column(ci).statistics
                    if st is None or not st.has_min_max:
                        continue
                    mn, mx = st.min, st.max
                    if name not in mins or mn < mins[name]:
                        mins[name] = mn
                    if name not in maxs or mx > maxs[name]:
                        maxs[name] = mx
            out.append({
                "path": path,
                "rows": md.num_rows,
                "min": {k: _jsonable(v) for k, v in mins.items()},
                "max": {k: _jsonable(v) for k, v in maxs.items()},
            })
    return out


def _jsonable(v: Any) -> Any:
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def write_bucketed(spark: SparkSession, catalog: HeraclesCatalog, table: str,
                   df: DataFrame | None = None, n_buckets: int = 8,
                   bucket_table: str | None = None) -> str:
    """Persist a key-organized table as a bucketed+sorted Spark table so
    key-aligned aggregations and co-bucketed joins plan with NO shuffle
    exchange — the reference's aspirational shuffle-free aggregation
    (HBaseStrategies.scala:44-62,86-175, dead code there; SURVEY §7.3
    names bucketBy as the idiomatic substitute, and §4's
    'RangePartitioning(keys)' scan declaration maps to the bucketing
    spec Spark stores in its catalog).

    Returns the bucketed table name (register in spark.table()). With an
    in-memory session catalog the bucketing spec lives for the session;
    on a cluster with a persistent metastore it survives restarts.
    """
    tbl = catalog.get_table(table)
    name = bucket_table or f"{tbl.name}_bucketed"
    data = df if df is not None else catalog.read_table(spark, table)
    (data.write
         .bucketBy(n_buckets, tbl.key_cols[0], *tbl.key_cols[1:])
         .sortBy(tbl.key_cols[0], *tbl.key_cols[1:])
         .mode("overwrite")
         .format("parquet")
         .saveAsTable(name))
    return name
