"""UDF surface (SURVEY §2.10): the reference registers Scala UDFs via
``session.udf.register`` and runs them in WHERE clauses under every
config combination (HBaseAdditionalQuerySuite.scala:204-238). The PySpark
equivalents — row UDF, Arrow-batched pandas UDF — are registered here,
with the pandas variant as the recommended (vectorized) form."""

from heracles_spark.functions.registry import register_builtin_udfs

__all__ = ["register_builtin_udfs"]
