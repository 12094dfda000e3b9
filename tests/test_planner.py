"""Stats-consuming planner: size estimation, join-strategy decision,
histogram selectivity — over the ANALYZE/REFRESH STATISTICS state."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from heracles_spark import planner, writer


def _mk(spark, catalog, name, n, with_strings=True):
    cols = [("k", "bigint"), ("v", "double")]
    sel = [F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")]
    if with_strings:
        cols.append(("s", "string"))
        sel.append(F.concat(F.lit("val_"), F.col("id")).alias("s"))
    catalog.create_table(name, cols, ["k"])
    writer.write_key_organized(spark, catalog, name,
                               spark.range(n).select(*sel), n_buckets=2)


def test_estimated_bytes_uses_stats_and_avg_len(spark, catalog):
    _mk(spark, catalog, "t", 1000)
    assert planner.estimated_table_bytes(catalog.get_table("t")) is None
    writer.analyze_table(spark, catalog, "t", for_columns=True)
    tbl = catalog.get_table("t")
    st = planner.table_stats(tbl)
    # avg_len of 'val_0'..'val_999': 4 + avg digits
    avg = st["columns"]["s"]["avg_len"]
    assert 6.5 < avg < 7.5
    est = planner.estimated_table_bytes(tbl)
    # 1000 * (8 + 8 + avg+20)
    assert est == int(1000 * (16 + avg + 20))
    assert st["columns"]["v"]["min"] == 0.0
    assert st["columns"]["v"]["max"] == 1998.0


def test_join_decision_broadcast_vs_shuffle_vs_default(spark, catalog):
    _mk(spark, catalog, "fact", 500, with_strings=False)
    _mk(spark, catalog, "dim", 50, with_strings=False)
    # dim never analyzed -> no hint, spark-default
    _, d = planner.join_with_stats(spark, catalog, "fact", "dim", ["k"])
    assert d["strategy"] == "spark-default" and d["est_bytes"] is None
    writer.analyze_table(spark, catalog, "dim", for_columns=True)
    df, d = planner.join_with_stats(spark, catalog, "fact", "dim", ["k"])
    assert d["strategy"] == "broadcast"
    assert d["est_bytes"] == 50 * 16
    assert df.count() == 50
    _, d = planner.join_with_stats(spark, catalog, "fact", "dim", ["k"],
                                   broadcast_threshold=10)
    assert d["strategy"] == "shuffle"


def test_histogram_selectivity_uniform(spark, catalog):
    _mk(spark, catalog, "u", 4000, with_strings=False)
    writer.analyze_table(spark, catalog, "u", columns=["v"])
    tbl = catalog.get_table("u")
    # v uniform over {0, 2, ..., 7998}: exact |v <= x| = floor(x/2)+1
    hist = planner.table_stats(tbl)["columns"]["v"]["histogram"]
    bound = max(b["rows"] for b in hist)
    for x in [0.0, 123.0, 1999.0, 3500.5, 7000.0, 7998.0]:
        est = planner.estimate_rows_leq(tbl, "v", x)
        exact = int(x // 2) + 1
        assert abs(est - exact) <= bound, (x, est, exact)
    assert planner.estimate_rows_leq(tbl, "v", -1.0) == 0.0
    assert planner.estimate_rows_leq(tbl, "v", 1e9) == 4000.0
    # column without histogram -> None
    assert planner.estimate_rows_leq(tbl, "k", 5.0) is None


def test_refresh_merges_minmax_and_avg_len(spark, catalog):
    _mk(spark, catalog, "m", 100)
    writer.analyze_table(spark, catalog, "m", for_columns=True)
    writer.insert_rows(spark, catalog, "m",
                       [(1000, -50.0, "longer_string_value"),
                        (1001, 9999.0, None)])
    st = writer.refresh_statistics(spark, catalog, "m")
    assert st["mode"] == "incremental"
    assert st["columns"]["v"]["min"] == -50.0
    assert st["columns"]["v"]["max"] == 9999.0
    assert st["columns"]["s"]["nulls"] == 1
    # merged avg == full-recompute avg (length-sum merge is exact)
    merged = st["columns"]["s"]["avg_len"]
    full = writer.analyze_table(spark, catalog, "m", for_columns=True)
    assert full["columns"]["s"]["avg_len"] == pytest.approx(merged)
    assert full["columns"]["v"]["min"] == -50.0


def test_column_width_defaults():
    assert planner.column_width_bytes("bigint", None) == 8
    assert planner.column_width_bytes("decimal(38,6)", None) == 16
    assert planner.column_width_bytes("string", None) == 40.0
    assert planner.column_width_bytes("string", {"avg_len": 5.0}) == 25.0
    assert planner.column_width_bytes("array<float>", None) == 64


def test_estimate_equijoin_rows(spark, catalog):
    _mk(spark, catalog, "l", 1000, with_strings=False)
    _mk(spark, catalog, "r", 100, with_strings=False)
    from heracles_spark.planner import estimate_equijoin_rows
    lt, rt = catalog.get_table("l"), catalog.get_table("r")
    assert estimate_equijoin_rows(lt, rt, "k", "k") is None
    writer.analyze_table(spark, catalog, "l", for_columns=True)
    writer.analyze_table(spark, catalog, "r", for_columns=True)
    lt, rt = catalog.get_table("l"), catalog.get_table("r")
    est = estimate_equijoin_rows(lt, rt, "k", "k")
    # keys 0..999 vs 0..99: true join rows = 100; estimate
    # 1000*100/max(ndv) with ~1.6% HLL error
    assert est == pytest.approx(100.0, rel=0.1)
    assert estimate_equijoin_rows(lt, rt, "k", "nope") is None
