"""MERGE INTO — conditional upsert/update/delete over key tables.

The reference's write surface stops at append/bulk-load with HBase's
implicit per-key upsert (HBaseRelation.scala:672-679); MERGE is this
engine's general mutation primitive layered on the same key-organized
writer. Covers clause ordering, SET */INSERT *, NOT MATCHED BY SOURCE,
subquery sources, and the multiple-match ambiguity error.
"""

from __future__ import annotations

import pytest

from heracles_spark.sql import _parse_merge


def _mk(hsession, rows="(1,'a',10),(2,'b',20),(3,'c',30)"):
    hsession.sql("""CREATE TABLE tgt (k INT, name STRING, v INT)
                    TBLPROPERTIES('keyCols'='k')""")
    hsession.sql(f"INSERT INTO tgt VALUES {rows}")


def _rows(hsession):
    return [(r.k, r.name, r.v) for r in
            hsession.sql("SELECT k, name, v FROM tgt ORDER BY k").collect()]


def test_parse_merge_full_form():
    p = _parse_merge(
        "MERGE INTO t AS a USING (SELECT 1 AS k) b ON a.k = b.k "
        "WHEN MATCHED AND a.v > 5 THEN UPDATE SET v = b.k "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (b.k, 0)")
    assert p["target"] == "t" and p["talias"] == "a" and p["salias"] == "b"
    assert p["source_sql"] == "SELECT 1 AS k"
    assert p["on"] == "a.k = b.k"
    kinds = [(c.kind, c.action) for c in p["clauses"]]
    assert kinds == [("matched", "update"), ("matched", "delete"),
                     ("not_matched", "insert")]
    assert p["clauses"][0].condition == "a.v > 5"
    assert p["clauses"][0].assignments == {"v": "b.k"}
    assert p["clauses"][2].assignments == {"k": "b.k", "v": "0"}


def test_parse_merge_case_when_in_condition():
    p = _parse_merge(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED AND (CASE WHEN s.v > 0 THEN 1 ELSE 0 END) = 1 "
        "THEN UPDATE SET *")
    assert p["clauses"][0].assignments == {"*": "*"}
    assert "CASE WHEN" in p["clauses"][0].condition


def test_parse_merge_not_matched_by_source():
    p = _parse_merge("MERGE INTO t USING s ON t.k = s.k "
                     "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    assert p["clauses"][0].kind == "not_matched_by_source"
    assert p["clauses"][0].action == "delete"


def test_merge_upsert(hsession):
    """Classic upsert: update matched, insert the rest."""
    _mk(hsession)
    hsession.sql("""
        MERGE INTO tgt USING (
            SELECT * FROM VALUES (2, 'B', 200), (4, 'd', 40) AS s(k, name, v)
        ) s ON tgt.k = s.k
        WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v
        WHEN NOT MATCHED THEN INSERT (k, name, v) VALUES (s.k, s.name, s.v)""")
    assert _rows(hsession) == [(1, "a", 10), (2, "B", 200),
                               (3, "c", 30), (4, "d", 40)]


def test_merge_conditional_update_and_delete(hsession):
    """First matching clause wins, in statement order (SQL:2003 14.9)."""
    _mk(hsession)
    hsession.sql("""
        MERGE INTO tgt USING (
            SELECT * FROM VALUES (1, 5), (2, 99), (3, 7) AS s(k, nv)
        ) s ON tgt.k = s.k
        WHEN MATCHED AND s.nv > 50 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = tgt.v + s.nv""")
    assert _rows(hsession) == [(1, "a", 15), (3, "c", 37)]


def test_merge_set_star_and_insert_star(hsession):
    _mk(hsession)
    hsession.sql("""
        MERGE INTO tgt USING (
            SELECT * FROM VALUES (3, 'C', 300), (5, 'e', 50) AS s(k, name, v)
        ) s ON tgt.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    assert _rows(hsession) == [(1, "a", 10), (2, "b", 20),
                               (3, "C", 300), (5, "e", 50)]


def test_merge_not_matched_by_source_delete(hsession):
    """Sync-style merge: target rows absent from the source are removed."""
    _mk(hsession)
    hsession.sql("""
        MERGE INTO tgt USING (
            SELECT * FROM VALUES (1, 'A') AS s(k, name)
        ) s ON tgt.k = s.k
        WHEN MATCHED THEN UPDATE SET name = s.name
        WHEN NOT MATCHED BY SOURCE AND tgt.v >= 30 THEN DELETE""")
    assert _rows(hsession) == [(1, "A", 10), (2, "b", 20)]


def test_merge_insert_only_with_condition(hsession):
    _mk(hsession)
    hsession.sql("""
        MERGE INTO tgt USING (
            SELECT * FROM VALUES (4, 'd', 40), (5, 'e', -1) AS s(k, name, v)
        ) s ON tgt.k = s.k
        WHEN NOT MATCHED AND s.v > 0
        THEN INSERT (k, name, v) VALUES (s.k, s.name, s.v)""")
    assert _rows(hsession) == [(1, "a", 10), (2, "b", 20),
                               (3, "c", 30), (4, "d", 40)]


def test_merge_ambiguous_match_raises(hsession):
    """A source matching one target row twice is rejected, not duplicated
    (same contract as Delta's MERGE)."""
    _mk(hsession)
    with pytest.raises(Exception, match="more than"):
        hsession.sql("""
            MERGE INTO tgt USING (
                SELECT * FROM VALUES (2, 1), (2, 2) AS s(k, x)
            ) s ON tgt.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.x""")


def test_merge_from_named_table(hsession):
    _mk(hsession)
    hsession.sql("""CREATE TABLE changes (k INT, v INT)
                    TBLPROPERTIES('keyCols'='k')""")
    hsession.sql("INSERT INTO changes VALUES (1, 100), (9, 900)")
    hsession.sql("""
        MERGE INTO tgt USING changes ON tgt.k = changes.k
        WHEN MATCHED THEN UPDATE SET v = changes.v
        WHEN NOT MATCHED THEN INSERT (k, name, v) VALUES (changes.k, 'new',
                                                          changes.v)""")
    assert _rows(hsession) == [(1, "a", 100), (2, "b", 20),
                               (3, "c", 30), (9, "new", 900)]


# -- file-level copy-on-write ------------------------------------------------

def _mk_multifile(hsession, spark, table="big", n=1000, n_buckets=8):
    from heracles_spark import writer

    hsession.sql(f"""CREATE TABLE {table} (k INT, v INT)
                     TBLPROPERTIES('keyCols'='k')""")
    df = spark.range(0, n).selectExpr("CAST(id AS INT) AS k",
                                      "CAST(id * 10 AS INT) AS v")
    writer.write_key_organized(spark, hsession.catalog, table, df,
                               n_buckets=n_buckets)
    return {f["path"] for f in hsession.catalog.get_table(table).files}


def test_merge_cow_rewrites_only_touched_files(hsession, spark):
    """A narrow change set rewrites only the files whose key range it
    intersects; the other files stay byte-identical on disk."""
    from heracles_spark import merge as merge_mod

    before = _mk_multifile(hsession, spark)
    assert len(before) == 8
    hsession.sql("""
        MERGE INTO big USING (
            SELECT * FROM VALUES (5, -1), (17, -2), (40, -3) AS s(k, nv)
        ) s ON big.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv""")
    st = merge_mod.LAST_MERGE_STATS
    assert st["mode"] == "cow"
    assert st["files_total"] == 8 and st["files_rewritten"] == 1
    after = {f["path"] for f in hsession.catalog.get_table("big").files}
    assert len(before & after) == 7          # 7 untouched files survive
    rows = dict(hsession.sql("SELECT k, v FROM big").collect())
    assert len(rows) == 1000
    assert rows[5] == -1 and rows[17] == -2 and rows[40] == -3
    assert rows[4] == 40 and rows[999] == 9990


def test_merge_cow_insert_outside_all_ranges(hsession, spark):
    """Inserts whose keys fall outside every file's range touch ZERO
    existing files — the anti-join runs against an empty target subset."""
    from heracles_spark import merge as merge_mod

    before = _mk_multifile(hsession, spark)
    hsession.sql("""
        MERGE INTO big USING (
            SELECT * FROM VALUES (5000, 1), (5001, 2) AS s(k, v)
        ) s ON big.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    st = merge_mod.LAST_MERGE_STATS
    assert st["mode"] == "cow" and st["files_rewritten"] == 0
    after = {f["path"] for f in hsession.catalog.get_table("big").files}
    assert before <= after and len(after) == 9
    got = hsession.sql("SELECT COUNT(*) AS n FROM big").collect()[0].n
    assert got == 1002


def test_merge_cow_matches_full_rewrite(hsession, spark):
    """COW and full-rewrite paths produce identical table contents."""
    from heracles_spark import merge as merge_mod
    from heracles_spark.merge import MergeClause

    _mk_multifile(hsession, spark, table="t_cow")
    _mk_multifile(hsession, spark, table="t_full")
    src = spark.createDataFrame(
        [(3, 333), (250, 2500), (999, -9), (1400, 7)], "k INT, v INT")
    clauses = [
        MergeClause("matched", "delete", condition="source.v < 0"),
        MergeClause("matched", "update", assignments={"v": "source.v"}),
        MergeClause("not_matched", "insert",
                    assignments={"k": "source.k", "v": "source.v"}),
    ]
    merge_mod.merge_into(spark, hsession.catalog, "t_cow", src,
                         "target.k = source.k", clauses, cow=True)
    assert merge_mod.LAST_MERGE_STATS["mode"] == "cow"
    merge_mod.merge_into(spark, hsession.catalog, "t_full", src,
                         "target.k = source.k", clauses, cow=False)
    assert merge_mod.LAST_MERGE_STATS["mode"] == "full"
    a = sorted(map(tuple, hsession.catalog.read_table(spark, "t_cow").collect()))
    b = sorted(map(tuple, hsession.catalog.read_table(spark, "t_full").collect()))
    assert a == b
    assert len(a) == 1000   # one delete, one insert


def test_merge_cow_disabled_by_not_matched_by_source(hsession, spark):
    """NOT MATCHED BY SOURCE can mutate any row, so the full table is
    rewritten."""
    from heracles_spark import merge as merge_mod

    _mk_multifile(hsession, spark)
    hsession.sql("""
        MERGE INTO big USING (
            SELECT * FROM VALUES (5, 1) AS s(k, v)
        ) s ON big.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE AND big.k >= 998 THEN DELETE""")
    assert merge_mod.LAST_MERGE_STATS["mode"] == "full"
    got = hsession.sql("SELECT COUNT(*) AS n, MIN(v) AS mn FROM big") \
                  .collect()[0]
    assert got.n == 998 and got.mn == 0
    assert hsession.sql("SELECT v FROM big WHERE k = 5").collect()[0].v == 1


def test_merge_cow_empty_source_is_noop(hsession, spark):
    from heracles_spark import merge as merge_mod
    from heracles_spark.merge import MergeClause

    before = _mk_multifile(hsession, spark)
    src = spark.createDataFrame([], "k INT, v INT")
    merge_mod.merge_into(
        spark, hsession.catalog, "big", src, "target.k = source.k",
        [MergeClause("matched", "update", assignments={"v": "source.v"})])
    assert merge_mod.LAST_MERGE_STATS["files_rewritten"] == 0
    after = {f["path"] for f in hsession.catalog.get_table("big").files}
    assert after == before


def test_merge_cow_ambiguity_still_detected(hsession, spark):
    import pytest as _pytest

    _mk_multifile(hsession, spark)
    with _pytest.raises(Exception, match="more than"):
        hsession.sql("""
            MERGE INTO big USING (
                SELECT * FROM VALUES (5, 1), (5, 2) AS s(k, v)
            ) s ON big.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v""")
