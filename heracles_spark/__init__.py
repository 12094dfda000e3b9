"""heracles_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bomeng/Heracles (HSpark).

The reference (/root/reference) is a Spark SQL extension that turns HBase
into a key-organized analytic store; all relational operators above the scan
are stock Spark SQL. This rebuild keeps that split, expressed Spark-first:

- ``session``   — tuned SparkSession factory (≙ HBaseSparkSession,
  reference src/main/scala/org/apache/spark/sql/hbase/HBaseSparkSession.scala:33)
- ``catalog``   — JSON metastore of key-organized tables
  (≙ HBaseCatalog, HBaseCatalog.scala:68-95)
- ``sql``       — DDL/DML dispatcher for the CREATE TABLE/LOAD DATA/INSERT
  surface (≙ HBaseStrategies analyzer rewrites, HBaseStrategies.scala:231-271)
- ``writer``    — key-range layout writer (≙ bulk load, HBaseCatalog.scala:507-663)
- ``pruning``   — driver-side file-range pruner (≙ critical-point region
  pruning, HBaseCriticalPoint.scala:410-731)
- ``operators`` — LLM-data-pipeline operators (dedup, similarity, text,
  multimodal) beyond the reference surface
- ``streaming`` — Structured Streaming ingest into key-organized tables
"""

from heracles_spark.session import get_session, HeraclesSession

__version__ = "0.1.0"

__all__ = ["get_session", "HeraclesSession", "__version__"]
