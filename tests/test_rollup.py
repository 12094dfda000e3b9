"""Incremental rollup maintenance (continuous aggregates).

The invariant under test everywhere: after any sequence of appends and
refreshes, the rollup table equals the full aggregate recomputed from
scratch over the source — incremental maintenance is exact, not
approximate."""

from __future__ import annotations

from pyspark.sql import functions as F

from heracles_spark import rollup, writer


def _mk_source(catalog, spark, rows, table="fact", append=False):
    if not append:
        catalog.create_table(
            table, [("k", "int"), ("grp", "string"), ("v", "int")], ["k"])
    df = spark.createDataFrame(rows, "k int, grp string, v int")
    writer.write_key_organized(spark, catalog, table, df,
                               mode="append", n_buckets=2)


def _full(spark, catalog, table="fact"):
    return sorted(map(tuple,
        catalog.read_table(spark, table)
               .groupBy("grp")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("v").cast("long")).alias("sv"),
                    F.min("v").alias("mn"), F.max("v").alias("mx"))
               .collect()))


def _rolled(spark, catalog, name="fact_by_grp"):
    return sorted(map(tuple,
        catalog.read_table(spark, name)
               .select("grp", "n", "sv", "mn", "mx").collect()))


AGGS = {"n": ("count", "k"), "sv": ("sum", "v"),
        "mn": ("min", "v"), "mx": ("max", "v")}


def test_rollup_incremental_equals_full(spark, catalog):
    _mk_source(catalog, spark,
               [(i, f"g{i % 3}", i * 2) for i in range(50)])
    rollup.create_rollup(spark, catalog, "fact_by_grp", "fact",
                         ["grp"], AGGS)
    st = rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    assert st["mode"] == "incremental" and st["new_files"] > 0
    assert _rolled(spark, catalog) == _full(spark, catalog)

    # Append a batch touching old groups AND introducing a new one.
    _mk_source(catalog, spark,
               [(i, f"g{i % 4}", -i) for i in range(100, 140)], append=True)
    st = rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    assert st["mode"] == "incremental"
    assert _rolled(spark, catalog) == _full(spark, catalog)

    # No new files ⇒ noop, state unchanged.
    st = rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    assert st["mode"] == "noop"
    assert _rolled(spark, catalog) == _full(spark, catalog)


def test_rollup_rebuild_after_source_rewrite(spark, catalog):
    _mk_source(catalog, spark,
               [(i, f"g{i % 2}", i) for i in range(30)])
    rollup.create_rollup(spark, catalog, "fact_by_grp", "fact",
                         ["grp"], AGGS)
    rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    # OPTIMIZE rewrites every source file: the tracked set vanishes and
    # the increment is undefined — refresh must detect it and rebuild.
    writer.optimize_table(spark, catalog, "fact")
    st = rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    assert st["mode"] == "rebuild"
    assert _rolled(spark, catalog) == _full(spark, catalog)
    # ... and subsequent appends go back to incremental.
    _mk_source(catalog, spark, [(500, "g9", 7)], append=True)
    st = rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    assert st["mode"] == "incremental"
    assert _rolled(spark, catalog) == _full(spark, catalog)


def test_rollup_group_exprs_and_validation(spark, catalog):
    import pytest

    _mk_source(catalog, spark,
               [(i, f"g{i % 2}", i) for i in range(20)])
    with pytest.raises(ValueError, match="not mergeable"):
        rollup.create_rollup(spark, catalog, "bad", "fact", ["grp"],
                             {"m": ("median", "v")})
    # Derived group column via group_exprs (value bucket).
    rollup.create_rollup(spark, catalog, "fact_by_bucket", "fact",
                         ["bucket"], {"n": ("count", "k")},
                         group_exprs={"bucket": "CAST(v DIV 10 AS INT)"})
    rollup.refresh_rollup(spark, catalog, "fact_by_bucket")
    got = sorted(map(tuple,
        catalog.read_table(spark, "fact_by_bucket").collect()))
    assert got == [(0, 10), (1, 10)]


def test_rollup_sql_surface(hsession, spark, catalog):
    """CREATE ROLLUP / REFRESH ROLLUP through the SQL dispatcher, with a
    derived group column and COUNT(*)."""
    _mk_source(catalog, spark, [(i, f"g{i % 2}", i) for i in range(40)])
    hsession.sql("""CREATE ROLLUP fact_rollup ON fact
                    GROUP BY grp, bucket = CAST(v DIV 20 AS INT)
                    AGG n = COUNT(*), sv = SUM(v), mx = MAX(v)""")
    st = hsession.sql("REFRESH ROLLUP fact_rollup").collect()[0]
    assert st.mode == "incremental" and st.new_files > 0
    got = {(r.grp, r.bucket): (r.n, r.sv, r.mx) for r in
           hsession.sql("SELECT * FROM fact_rollup").collect()}
    exp = {}
    for i in range(40):
        k = (f"g{i % 2}", i // 20)
        n, sv, mx = exp.get(k, (0, 0, -1))
        exp[k] = (n + 1, sv + i, max(mx, i))
    assert got == exp
    assert hsession.sql("REFRESH ROLLUP fact_rollup").collect()[0].mode \
        == "noop"


def test_rollup_count_col_skips_nulls(spark, catalog):
    """COUNT(col) counts non-null values (SQL semantics); COUNT(*)
    counts rows — and both stay exact across incremental refreshes."""
    catalog.create_table(
        "factn", [("k", "int"), ("grp", "string"), ("v", "int")], ["k"])
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "b", None), (4, "b", 5)],
        "k int, grp string, v int")
    writer.write_key_organized(spark, catalog, "factn", df, n_buckets=1)
    rollup.create_rollup(spark, catalog, "factn_r", "factn", ["grp"],
                         {"rows": ("count", "*"), "nv": ("count", "v"),
                          "sv": ("sum", "v")})
    rollup.refresh_rollup(spark, catalog, "factn_r")
    got = {r.grp: (r.rows, r.nv) for r in
           catalog.read_table(spark, "factn_r").collect()}
    assert got == {"a": (2, 1), "b": (2, 1)}

    df2 = spark.createDataFrame([(5, "a", None), (6, "a", 7)],
                                "k int, grp string, v int")
    writer.write_key_organized(spark, catalog, "factn", df2, n_buckets=1)
    st = rollup.refresh_rollup(spark, catalog, "factn_r")
    assert st["mode"] == "incremental"
    got = {r.grp: (r.rows, r.nv) for r in
           catalog.read_table(spark, "factn_r").collect()}
    assert got == {"a": (4, 2), "b": (2, 1)}


def test_rollup_refresh_single_commit(spark, catalog, monkeypatch):
    """The processed-file set lands in the SAME catalog commit as the
    rollup's data write — a crash can never leave the fold applied but
    untracked (which a replayed refresh would double-count)."""
    import json

    _mk_source(catalog, spark, [(i, f"g{i % 2}", i) for i in range(20)])
    rollup.create_rollup(spark, catalog, "fact_by_grp", "fact",
                         ["grp"], AGGS)
    saves = []
    orig = catalog._save

    def spy(tbl):
        if tbl.name == "fact_by_grp":
            saves.append(tbl.properties.get(rollup._FILES_PROP))
        orig(tbl)

    monkeypatch.setattr(catalog, "_save", spy)
    rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    current = {f["path"] for f in catalog.get_table("fact").files}
    assert len(saves) == 1 and set(json.loads(saves[0])) == current

    saves.clear()
    _mk_source(catalog, spark, [(100, "g0", 1)], append=True)
    rollup.refresh_rollup(spark, catalog, "fact_by_grp")
    current = {f["path"] for f in catalog.get_table("fact").files}
    assert len(saves) == 1 and set(json.loads(saves[0])) == current
