"""Salting utilities: exact results under hot-key skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark.operators.skew import salted_count_distinct, salted_join


def test_salted_count_distinct_exact(spark):
    # one hot key with many distinct values + a long tail
    rows = ([("hot", f"v{i % 137}") for i in range(2000)]
            + [(f"k{i}", f"v{i}") for i in range(50)])
    df = spark.createDataFrame(rows, "k string, x string")
    got = {r.k: r.n_distinct
           for r in salted_count_distinct(df, "k", "x", n_salt=8).collect()}
    exp = {r.k: r.n
           for r in df.groupBy("k")
                      .agg(F.count_distinct("x").alias("n")).collect()}
    assert got == exp
    assert got["hot"] == 137


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k int, v int")
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (9, "z")], "k int, tag string")
    for how in ("inner", "left"):
        got = sorted(map(tuple,
            salted_join(big, small, "k", n_salt=4, how=how).collect()))
        exp = sorted(map(tuple, big.join(small, "k", how).collect()))
        assert got == exp


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows land in multiple salt buckets — the point."""
    big = spark.createDataFrame([(7, i) for i in range(500)], "k int, v int")
    small = spark.createDataFrame([(7, "x")], "k int, tag string")
    from heracles_spark.operators.skew import F as _F  # reuse module's F
    salt = _F.pmod(_F.xxhash64(*[_F.col(c) for c in big.columns]), _F.lit(4))
    n_buckets = big.withColumn("s", salt).select("s").distinct().count()
    assert n_buckets == 4
    assert salted_join(big, small, "k", n_salt=4).count() == 500


def test_lineitem_skew_join_plan_is_salted(spark):
    from heracles_spark.queries.relational4 import lineitem_skew_join
    from tests.conftest import SF_SMALL

    df = lineitem_skew_join(spark, SF_SMALL)
    rows = df.collect()
    assert rows and all(r["salted"] for r in rows)
    # hot key 0 dominates: its group count must cover ~3/4 of lineitem
    total = sum(r["n_lines"] for r in rows)
    assert total > 0
