"""Rollup-backed automatic query rewrite (heracles_spark.rewrite).

A GROUP BY over the fact table whose groups+aggregates derive from a
declared fresh rollup is answered by re-aggregating the rollup —
O(groups) instead of O(fact) — with conservative bail-outs that keep
every answer identical to the base-table plan.
"""
from __future__ import annotations

import pytest

from heracles_spark import rewrite, rollup, writer


@pytest.fixture()
def sess(hsession, spark, catalog):
    hsession.sql("CREATE TABLE fact (k INT, grp STRING, region STRING, "
                 "v INT) TBLPROPERTIES('keyCols'='k')")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", f"r{i % 2}", i) for i in range(60)],
        "k int, grp string, region string, v int")
    writer.write_key_organized(spark, catalog, "fact", df, n_buckets=2)
    catalog.read_table(spark, "fact").createOrReplaceTempView("fact")
    rollup.create_rollup(
        spark, catalog, "fact_r", "fact", ["grp", "region"],
        {"sv": ("sum", "v"), "nrows": ("count", "*"),
         "nv": ("count", "v"), "mn": ("min", "v"), "mx": ("max", "v")})
    rollup.refresh_rollup(spark, catalog, "fact_r")
    return hsession


def _base(spark, sql):
    return sorted(map(tuple, spark.sql(sql).collect()))


def test_exact_group_rewrite(sess, spark):
    q = ("SELECT grp, region, SUM(v) AS sv, COUNT(*) AS n FROM fact "
         "GROUP BY grp, region ORDER BY grp, region")
    got = sorted(map(tuple, sess.sql(q).collect()))
    assert rewrite.LAST_REWRITE == "fact_r"
    assert got == _base(spark, q)


def test_coarser_group_reaggregates(sess, spark):
    q = ("SELECT grp, SUM(v) AS sv, COUNT(*) AS n, MIN(v) AS mn, "
         "MAX(v) AS mx, COUNT(v) AS nv FROM fact GROUP BY grp")
    got = sorted(map(tuple, sess.sql(q).collect()))
    assert rewrite.LAST_REWRITE == "fact_r"
    assert got == _base(spark, q)


def test_avg_derived_from_sum_count(sess, spark):
    q = "SELECT grp, AVG(v) AS av FROM fact GROUP BY grp"
    got = sorted(map(tuple, sess.sql(q).collect()))
    assert rewrite.LAST_REWRITE == "fact_r"
    assert got == _base(spark, q)


def test_where_on_group_col_rewrites(sess, spark):
    q = ("SELECT grp, SUM(v) AS sv FROM fact WHERE region = 'r0' "
         "GROUP BY grp ORDER BY grp")
    got = sorted(map(tuple, sess.sql(q).collect()))
    assert rewrite.LAST_REWRITE == "fact_r"
    assert got == _base(spark, q)


def test_rewrite_reads_rollup_files_not_fact(sess, spark, catalog):
    df = sess.sql("SELECT grp, SUM(v) AS sv FROM fact GROUP BY grp")
    assert rewrite.LAST_REWRITE == "fact_r"
    scanned = {p.removeprefix("file://") for p in df.inputFiles()}
    rollup_files = {f["path"] for f in catalog.get_table("fact_r").files}
    fact_files = {f["path"] for f in catalog.get_table("fact").files}
    assert scanned <= rollup_files
    assert scanned.isdisjoint(fact_files)


def test_stale_rollup_blocks_rewrite(sess, spark, catalog):
    df2 = spark.createDataFrame([(100, "g0", "r0", 100)],
                                "k int, grp string, region string, v int")
    writer.write_key_organized(spark, catalog, "fact", df2, n_buckets=1)
    catalog.read_table(spark, "fact").createOrReplaceTempView("fact")
    q = "SELECT grp, SUM(v) AS sv FROM fact GROUP BY grp"
    got = sorted(map(tuple, sess.sql(q).collect()))
    assert rewrite.LAST_REWRITE is None          # stale: no rewrite
    assert got == _base(spark, q)                # and the answer is live
    rollup.refresh_rollup(spark, catalog, "fact_r")
    got2 = sorted(map(tuple, sess.sql(q).collect()))
    assert rewrite.LAST_REWRITE == "fact_r"      # fresh again
    assert got2 == got


@pytest.mark.parametrize("q", [
    # predicate on a measure column
    "SELECT grp, SUM(v) AS sv FROM fact WHERE v > 5 GROUP BY grp",
    # non-mergeable aggregate
    "SELECT grp, COUNT(DISTINCT v) AS dv FROM fact GROUP BY grp",
    # aggregate of an expression
    "SELECT grp, SUM(v + 1) AS sv FROM fact GROUP BY grp",
    # group by an expression
    "SELECT upper(grp) AS g, SUM(v) AS sv FROM fact GROUP BY upper(grp)",
    # ungrouped column math in select
    "SELECT grp, SUM(v) / 2 AS h FROM fact GROUP BY grp",
    # HAVING over an aggregate
    "SELECT grp, SUM(v) AS sv FROM fact GROUP BY grp HAVING SUM(v) > 100",
])
def test_underivable_queries_bail_and_stay_correct(sess, spark, q):
    got = sorted(map(tuple, sess.sql(q).collect()))
    assert rewrite.LAST_REWRITE is None
    assert got == _base(spark, q)


def test_rewrite_toggle(sess, spark):
    sess.rollup_rewrite = False
    sess.sql("SELECT grp, SUM(v) AS sv FROM fact GROUP BY grp").collect()
    assert rewrite.LAST_REWRITE is None
    sess.rollup_rewrite = True


def test_default_output_names_match_base_plan(sess, spark):
    # No aliases: Spark's default names (sum(v), count(1)...) must
    # survive the rewrite so downstream code sees identical schemas.
    q = "SELECT grp, SUM(v), COUNT(*) FROM fact GROUP BY grp"
    df = sess.sql(q)
    assert rewrite.LAST_REWRITE == "fact_r"
    assert df.columns == spark.sql(q).columns
