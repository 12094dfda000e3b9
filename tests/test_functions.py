"""UDF surface (≙ udf-in-WHERE, HBaseAdditionalQuerySuite.scala:204-238)."""

from __future__ import annotations

from heracles_spark.functions import register_builtin_udfs


def test_row_udf_in_where(spark):
    register_builtin_udfs(spark)
    df = spark.createDataFrame([(18,), (25,), (None,)], "age: int")
    df.createOrReplaceTempView("people_udf")
    got = spark.sql(
        "SELECT age FROM people_udf WHERE age_filter(age)").collect()
    assert [r["age"] for r in got] == [25]


def test_pandas_udf_in_where(spark):
    register_builtin_udfs(spark)
    df = spark.createDataFrame([(18,), (25,), (30,)], "age: int")
    df.createOrReplaceTempView("people_udf2")
    got = spark.sql(
        "SELECT age FROM people_udf2 WHERE age_filter_v(age) ORDER BY age").collect()
    assert [r["age"] for r in got] == [25, 30]


def test_zscore_batch(spark):
    register_builtin_udfs(spark)
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v: double").coalesce(1)
    df.createOrReplaceTempView("vals_udf")
    got = sorted(r[0] for r in
                 spark.sql("SELECT zscore_batch(v) FROM vals_udf").collect())
    assert got == [-1.0, 0.0, 1.0]
