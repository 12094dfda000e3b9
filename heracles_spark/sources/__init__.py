"""Source readers (SURVEY §2.1 S6/S10): schema-enforced CSV (bulk-load
convention: empty field ⇒ NULL), JSON-lines, and parquet with column
projection. Thin wrappers over spark.read keeping the reference's null
conventions in one place."""

from heracles_spark.sources.readers import csv_source, json_source, parquet_source

__all__ = ["csv_source", "json_source", "parquet_source"]
