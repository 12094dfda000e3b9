"""Two-pass global ranking / RANGE frames (operators.ranking).

A bare Window.orderBy() funnels the whole input through one task; these
operators must produce IDENTICAL results through a partitioned plan.
Each test pins equivalence against the naive single-partition window on
randomized data, and the plan test pins the absence of the
Exchange SinglePartition the naive form would introduce.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Window

from heracles_spark.operators.ranking import (
    cume_dist_col, ntile_col, percent_rank_col, range_frame_agg,
    with_global_ranks)


def _rand_df(spark, n=500, seed=7):
    rnd = random.Random(seed)
    rows = [(i, rnd.uniform(-1000.0, 1000.0), rnd.randint(0, 99))
            for i in range(n)]
    return spark.createDataFrame(rows, "id: long, v: double, k: int")


def test_global_ranks_match_naive_window(spark):
    df = _rand_df(spark)
    got = (with_global_ranks(df, ["v", "id"], n_buckets=16)
           .select("id", "__rn", "__n"))
    w = Window.orderBy("v", "id")
    want = df.select("id", F.row_number().over(w).alias("__rn"),
                     F.count(F.lit(1)).over(
                         Window.rowsBetween(Window.unboundedPreceding,
                                            Window.unboundedFollowing))
                     .alias("__n"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_distribution_functions_match_builtins(spark):
    df = _rand_df(spark, n=337)           # non-divisible by k on purpose
    ranked = with_global_ranks(df, ["v", "id"], n_buckets=8)
    rn, n = F.col("__rn"), F.col("__n")
    got = (ranked.select("id",
                         ntile_col(rn, n, 4).alias("nt"),
                         F.round(percent_rank_col(rn, n), 9).alias("pr"),
                         F.round(cume_dist_col(rn, n), 9).alias("cd")))
    w = Window.orderBy("v", "id")
    want = df.select("id", F.ntile(4).over(w).alias("nt"),
                     F.round(F.percent_rank().over(w), 9).alias("pr"),
                     F.round(F.cume_dist().over(w), 9).alias("cd"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_global_ranks_skewed_and_constant_key(spark):
    # All rows share one order value: buckets degenerate to one — still
    # correct (total order restored by the id tiebreaker).
    rows = [(i, 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id: long, v: double")
    got = with_global_ranks(df, ["v", "id"], n_buckets=4) \
        .select("id", F.col("__rn").alias("rn")).collect()
    assert sorted((r.id, r.rn) for r in got) == \
        [(i, i + 1) for i in range(50)]


def test_range_frame_matches_naive_window(spark):
    rnd = random.Random(11)
    # Duplicate keys + gaps: the value-RANGE semantics corner cases.
    rows = [(rnd.randint(0, 3000), float(rnd.randint(1, 100)))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "k: long, v: double")
    got = (range_frame_agg(df, "k", F.col("v"), preceding=500,
                           out_col="s")
           .groupBy("k").agg(F.sum("s").alias("s"),
                             F.count(F.lit(1)).alias("c")))
    w = Window.orderBy("k").rangeBetween(-500, Window.currentRow)
    want = (df.withColumn("s", F.sum("v").over(w))
              .groupBy("k").agg(F.sum("s").alias("s"),
                                F.count(F.lit(1)).alias("c")))
    assert sorted(got.collect()) == sorted(want.collect())


def test_range_frame_rejects_undersized_chunk(spark):
    df = spark.createDataFrame([(1, 1.0)], "k: long, v: double")
    try:
        range_frame_agg(df, "k", F.col("v"), preceding=500,
                        out_col="s", chunk=100)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_rewritten_queries_avoid_global_data_window(spark):
    """Every data-sized window (row_number / the frame aggregate) must be
    partitioned by the bucket column __b. SinglePartition exchanges are
    allowed to remain ONLY on the offsets side — a relation of
    O(n_buckets) rows by construction, not the table."""
    import re

    from heracles_spark.queries import all_queries

    reg = all_queries()
    sf = "/root/testdata/sf0.001"
    for name in ("ntile_percentiles", "window_distribution_ranks",
                 "window_range_frame"):
        plan = reg[name](spark, sf)._jdf.queryExecution().executedPlan() \
            .toString()
        data_windows = [l for l in plan.splitlines()
                        if re.search(r"row_number\(\)|sum\(__v", l)]
        assert data_windows, name
        for line in data_windows:
            assert "windowspecdefinition(__b" in line, (name, line)


def test_global_ordered_cumsum_matches_plain_window(spark):
    """Bucketed global cumsum == single-partition window cumsum,
    bit-for-bit (decimal values), ascending and descending, at any
    partition count."""
    import random

    from pyspark.sql import Window

    from heracles_spark.operators.ranking import with_global_ordered_cumsum

    rng = random.Random(3)
    rows = [(i, float(rng.randrange(1, 1000))) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(9)
    for desc in (False, True):
        got = with_global_ordered_cumsum(
            df.withColumn("__k", F.col("v")),
            ["__k", "id"], F.col("v").cast("decimal(38,6)"),
            out_col="cum", n_buckets=16, descending=desc)
        order = [F.col("v").desc(), F.col("id").desc()] if desc else \
                [F.col("v").asc(), F.col("id").asc()]
        w = (Window.orderBy(*order)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
        want = df.withColumn(
            "cum", F.sum(F.col("v").cast("decimal(38,6)")).over(w))
        assert sorted((r.id, str(r.cum)) for r in got.collect()) == \
               sorted((r.id, str(r.cum)) for r in want.collect()), desc


def test_global_cumsum_and_ranks_keep_null_keys(spark):
    """Round-8 advisor fix: NULL order keys must not silently vanish
    from the bucket join — they take a dedicated bucket at Spark's
    window NULL position (ASC = NULLS FIRST, DESC = NULLS LAST) and
    the result still equals the single-partition window row-for-row."""
    from heracles_spark.operators.ranking import (with_global_ordered_cumsum,
                                                  with_global_ranks)

    rows = [(0, None, 5.0), (1, 10.0, 1.0), (2, None, 2.0),
            (3, 30.0, 3.0), (4, 20.0, 4.0)]
    df = spark.createDataFrame(rows, "id long, k double, v double") \
              .repartition(3)

    for desc in (False, True):
        got = with_global_ordered_cumsum(
            df, ["k", "id"], F.col("v").cast("decimal(38,6)"),
            out_col="cum", n_buckets=4, descending=desc)
        assert got.count() == 5                      # nothing dropped
        order = [F.col("k").desc(), F.col("id").desc()] if desc else \
                [F.col("k").asc(), F.col("id").asc()]
        w = (Window.orderBy(*order)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
        want = df.withColumn(
            "cum", F.sum(F.col("v").cast("decimal(38,6)")).over(w))
        assert sorted((r.id, str(r.cum)) for r in got.collect()) == \
               sorted((r.id, str(r.cum)) for r in want.collect()), desc

    got = with_global_ranks(df, ["k", "id"], n_buckets=4)
    w = Window.orderBy("k", "id")
    want = df.select("id", F.row_number().over(w).alias("__rn"))
    assert sorted((r["id"], r["__rn"]) for r in got.select("id", "__rn")
                  .collect()) == \
           sorted((r["id"], r["__rn"]) for r in want.collect())
