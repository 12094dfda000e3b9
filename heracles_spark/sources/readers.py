"""Schema-enforced source readers.

- csv_source: headerless CSV with the reference's bulk-load convention
  (empty field ⇒ NULL — HadoopReader.scala:41-56; short rows padded with
  nulls via PERMISSIVE mode).
- json_source: JSON-lines with explicit schema (no inference job — at
  100 TB schema inference is a full extra pass; ≙ S10 side sources,
  HBaseAdditionalQuerySuite.scala:104-108).
- parquet_source: parquet with optional column projection pushed into
  the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def csv_source(spark: SparkSession, path: str, schema: T.StructType,
               delimiter: str = ",") -> DataFrame:
    return (spark.read
            .schema(schema)
            .option("header", "false")
            .option("delimiter", delimiter)
            .option("emptyValue", None)
            .option("nullValue", "")
            .option("mode", "PERMISSIVE")
            .csv(path))


def json_source(spark: SparkSession, path: str,
                schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def parquet_source(spark: SparkSession, path: str,
                   columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def orc_source(spark: SparkSession, path: str,
               columns: list[str] | None = None) -> DataFrame:
    """ORC with optional projection — same pushdown/pruning behavior as
    parquet (both columnar, both stats-indexed)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def text_source(spark: SparkSession, path: str,
                value_col: str = "value") -> DataFrame:
    """Line-oriented text (one row per line) — the raw-corpus entry
    point before any parsing; schema is a single string column."""
    df = spark.read.text(path)
    return df.withColumnRenamed("value", value_col) \
        if value_col != "value" else df
