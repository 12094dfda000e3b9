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
