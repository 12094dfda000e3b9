"""UPDATE / DELETE — predicate-driven copy-on-write mutation.

The reference's CLI rejects UPDATE/DELETE outright (HBaseSQLCliDriver
accepts only SELECT/CREATE/DROP/ALTER/INSERT/LOAD/SHOW/DESCRIBE); this
engine adds them as first-class COW mutations next to MERGE. Covers
standard semantics (pre-update RHS evaluation, 3VL NULL predicates, key
immutability) and the file-pruning scale path.
"""

from __future__ import annotations

import pytest

from heracles_spark import dml
from heracles_spark.dml import where_to_pruning_pred


def _mk(hsession, rows="(1,'a',10),(2,'b',20),(3,'c',30),(4,'d',NULL)"):
    hsession.sql("""CREATE TABLE t (k INT, name STRING, v INT)
                    TBLPROPERTIES('keyCols'='k')""")
    hsession.sql(f"INSERT INTO t VALUES {rows}")


def _rows(hsession):
    return [(r.k, r.name, r.v) for r in
            hsession.sql("SELECT k, name, v FROM t ORDER BY k").collect()]


# -- WHERE → pruning AST compiler -----------------------------------------

def test_where_pred_conjuncts():
    assert where_to_pruning_pred("k = 3") == ("=", "k", 3)
    assert where_to_pruning_pred("k = 3 AND v > 1.5") == \
        ("and", ("=", "k", 3), (">", "v", 1.5))
    assert where_to_pruning_pred("k BETWEEN 2 AND 5 AND name = 'x'") == \
        ("and", ("between", "k", 2, 5), ("=", "name", "x"))
    assert where_to_pruning_pred("k IN (1, 2, 3)") == ("in", "k", [1, 2, 3])
    assert where_to_pruning_pred("name IS NOT NULL") == ("isnotnull", "name")
    assert where_to_pruning_pred("name <> 'it''s'") == ("!=", "name", "it's")


def test_where_pred_conservative_bailouts():
    # OR / NOT at top level: no pruning (full rewrite), never wrong rows.
    assert where_to_pruning_pred("k = 1 OR k = 9") is None
    assert where_to_pruning_pred("NOT (k = 1)") is None
    assert where_to_pruning_pred(None) is None
    # Unparseable conjunct is dropped; parseable one still prunes.
    assert where_to_pruning_pred("length(name) > 2 AND k = 7") == ("=", "k", 7)
    # String containing ' AND ' must not be split inside the literal.
    assert where_to_pruning_pred("name = 'x AND y'") == ("=", "name", "x AND y")


def test_where_pred_temporal_literal_normalized_to_stats_encoding():
    # File stats store timestamps as isoformat ('T' separator); the SQL
    # literal form uses a space. Without normalization, lexicographic
    # 'T' (0x54) vs ' ' (0x20) misorders same-day values.
    assert where_to_pruning_pred(
        "ts < '2024-06-01 12:00:00'", {"ts": "timestamp"}) == \
        ("<", "ts", "2024-06-01T12:00:00")
    # Date literals have no separator to rewrite.
    assert where_to_pruning_pred("d = '2024-06-01'", {"d": "date"}) == \
        ("=", "d", "2024-06-01")
    # Non-string literal on a temporal column: conjunct dropped (sound).
    assert where_to_pruning_pred("ts < 42", {"ts": "timestamp"}) is None


def test_where_pred_type_mismatch_drops_conjunct():
    # k = '3' on an int key is valid SQL (Spark casts row-level) but the
    # str-vs-int box comparison would throw or misorder — drop it.
    assert where_to_pruning_pred("k = '3'", {"k": "int"}) is None
    assert where_to_pruning_pred("name = 3", {"name": "string"}) is None
    # The remaining typed conjunct still prunes.
    assert where_to_pruning_pred("k = '3' AND v > 5",
                                 {"k": "int", "v": "int"}) == (">", "v", 5)


def test_may_match_type_mismatch_degrades_to_may():
    from heracles_spark.pruning import may_match
    # Literal/stat type mismatch must degrade to MAY, never raise.
    assert may_match(("=", "k", "3"), {"k": 1}, {"k": 9}, ["k"]) is True
    assert may_match(("in", "k", ["a", "b"]), {"k": 1}, {"k": 9}, ["k"]) \
        is True
    assert may_match(("between", "k", "a", "b"), {"k": 1}, {"k": 9},
                     ["k"]) is True


# -- DELETE ---------------------------------------------------------------

def test_delete_where(hsession):
    _mk(hsession)
    hsession.sql("DELETE FROM t WHERE v >= 20")
    assert _rows(hsession) == [(1, "a", 10), (4, "d", None)]


def test_delete_null_predicate_keeps_row(hsession):
    _mk(hsession)
    # v is NULL for k=4: predicate evaluates NULL → row is kept (3VL).
    hsession.sql("DELETE FROM t WHERE v < 100")
    assert _rows(hsession) == [(4, "d", None)]


def test_delete_all(hsession):
    _mk(hsession)
    hsession.sql("DELETE FROM t")
    assert _rows(hsession) == []


def test_delete_stats_df(hsession):
    _mk(hsession)
    out = hsession.sql("DELETE FROM t WHERE k = 2").collect()[0]
    assert out.rows_affected == 1


# -- UPDATE ---------------------------------------------------------------

def test_update_where(hsession):
    _mk(hsession)
    hsession.sql("UPDATE t SET v = v * 10 WHERE k <= 2")
    assert _rows(hsession) == [(1, "a", 100), (2, "b", 200),
                               (3, "c", 30), (4, "d", None)]


def test_update_multi_assignment_uses_pre_update_row(hsession):
    _mk(hsession, rows="(1,'a',10)")
    # SQL standard: both RHS evaluate against the OLD row, so v and the
    # name derived from v must not see each other's new values.
    hsession.sql("UPDATE t SET v = v + 1, name = concat(name, v)")
    assert _rows(hsession) == [(1, "a10", 11)]


def test_update_no_where_hits_all(hsession):
    _mk(hsession, rows="(1,'a',10),(2,'b',20)")
    out = hsession.sql("UPDATE t SET v = 0").collect()[0]
    assert out.rows_affected == 2
    assert _rows(hsession) == [(1, "a", 0), (2, "b", 0)]


def test_update_key_column_rejected(hsession):
    _mk(hsession)
    with pytest.raises(ValueError, match="key column"):
        hsession.sql("UPDATE t SET k = k + 1")


def test_update_unknown_column_rejected(hsession):
    _mk(hsession)
    with pytest.raises(ValueError, match="no such column"):
        hsession.sql("UPDATE t SET nope = 1")


def test_update_where_keyword_inside_string_literal(hsession):
    _mk(hsession, rows="(1,'a',10),(2,'b',20)")
    # The WHERE split must scan at quote depth 0 — 'a WHERE b' is a value.
    hsession.sql("UPDATE t SET name = 'a WHERE b'")
    assert _rows(hsession) == [(1, "a WHERE b", 10), (2, "a WHERE b", 20)]
    hsession.sql("UPDATE t SET name = 'x WHERE y' WHERE k = 2")
    assert _rows(hsession) == [(1, "a WHERE b", 10), (2, "x WHERE y", 20)]


def test_delete_string_literal_on_int_key(hsession):
    _mk(hsession)
    # Implicit cast: '2' probes int stats; must delete, not throw.
    hsession.sql("DELETE FROM t WHERE k = '2'")
    assert [r[0] for r in _rows(hsession)] == [1, 3, 4]


def test_delete_timestamp_space_literal_prunes_correctly(
        hsession, spark, catalog):
    from heracles_spark import writer
    hsession.sql("""CREATE TABLE ev (ts TIMESTAMP, v INT)
                    TBLPROPERTIES('keyCols'='ts')""")
    df = spark.sql("""
        SELECT TIMESTAMP'2024-06-01 05:00:00' + make_interval(0,0,0,0,id)
               AS ts, CAST(id AS INT) AS v
        FROM range(12)""")
    writer.write_key_organized(spark, catalog, "ev", df, n_buckets=2)
    catalog.read_table(spark, "ev").createOrReplaceTempView(
        catalog.view_name("ev"))
    # File min '2024-06-01T05:00:00' vs literal '2024-06-01 12:00:00':
    # unnormalized lexicographic compare classifies the file NO and the
    # delete silently skips it.
    hsession.sql("DELETE FROM ev WHERE ts < '2024-06-01 12:00:00'")
    assert dml.LAST_DML_STATS["rows_affected"] == 7
    left = hsession.sql("SELECT COUNT(*) AS n FROM ev").collect()[0].n
    assert left == 5


# -- copy-on-write file pruning -------------------------------------------

def _mk_wide(hsession, spark, catalog):
    """8-file key-organized table over k = 0..799."""
    from heracles_spark import writer
    hsession.sql("""CREATE TABLE w (k INT, v INT)
                    TBLPROPERTIES('keyCols'='k')""")
    df = spark.range(800).selectExpr("CAST(id AS INT) k", "CAST(id AS INT) v")
    writer.write_key_organized(spark, catalog, "w", df, n_buckets=8)
    catalog.read_table(spark, "w").createOrReplaceTempView(
        catalog.view_name("w"))


def test_delete_prunes_rewrite_set(hsession, spark, catalog):
    _mk_wide(hsession, spark, catalog)
    assert len(catalog.get_table("w").files) == 8
    hsession.sql("DELETE FROM w WHERE k = 5")
    st = dml.LAST_DML_STATS
    assert st["files_rewritten"] == 1 and st["files_total"] == 8
    assert st["rows_affected"] == 1
    got = hsession.sql("SELECT COUNT(*) AS n FROM w").collect()[0].n
    assert got == 799


def test_update_prunes_rewrite_set(hsession, spark, catalog):
    _mk_wide(hsession, spark, catalog)
    hsession.sql("UPDATE w SET v = -1 WHERE k BETWEEN 10 AND 20")
    st = dml.LAST_DML_STATS
    assert st["files_rewritten"] == 1 and st["rows_affected"] == 11
    n = hsession.sql("SELECT COUNT(*) AS n FROM w WHERE v = -1").collect()[0].n
    assert n == 11


def test_update_unprunable_predicate_full_rewrite_still_correct(
        hsession, spark, catalog):
    _mk_wide(hsession, spark, catalog)
    hsession.sql("UPDATE w SET v = -5 WHERE k = 3 OR k = 790")
    st = dml.LAST_DML_STATS
    assert st["files_rewritten"] == 8      # OR disables pruning
    assert st["rows_affected"] == 2
    n = hsession.sql("SELECT COUNT(*) AS n FROM w WHERE v = -5").collect()[0].n
    assert n == 2


def test_dml_respects_time_travel(hsession, spark, catalog):
    _mk(hsession, rows="(1,'a',10),(2,'b',20)")
    v_before = catalog.get_table("t").version
    hsession.sql("DELETE FROM t WHERE k = 1")
    old = catalog.read_table(spark, "t", version=v_before)
    assert old.count() == 2
    assert catalog.read_table(spark, "t").count() == 1


def test_delete_inside_transaction_rollback(hsession):
    _mk(hsession, rows="(1,'a',10),(2,'b',20)")
    hsession.sql("BEGIN")
    hsession.sql("DELETE FROM t WHERE k = 1")
    hsession.sql("ROLLBACK")
    assert _rows(hsession) == [(1, "a", 10), (2, "b", 20)]


def test_update_inside_transaction_commit(hsession):
    _mk(hsession, rows="(1,'a',10),(2,'b',20)")
    hsession.sql("BEGIN")
    hsession.sql("UPDATE t SET v = 99 WHERE k = 2")
    hsession.sql("DELETE FROM t WHERE k = 1")
    hsession.sql("COMMIT")
    assert _rows(hsession) == [(2, "b", 99)]


def test_insert_select_source_routes(hsession, catalog):
    """Round-12 fourth wave: the source SELECT of INSERT ... SELECT
    (and the SELECT source of MERGE) goes through the dispatcher, so
    a key-filtered source prunes its file list instead of reading the
    whole table."""
    from heracles_spark import writer
    from pyspark.sql import functions as F

    hsession.sql("""CREATE TABLE isrc (k BIGINT, v BIGINT)
                    TBLPROPERTIES('keyCols'='k')""")
    hsession.sql("""CREATE TABLE idst (k BIGINT, v BIGINT)
                    TBLPROPERTIES('keyCols'='k')""")
    writer.write_key_organized(
        hsession.spark, catalog, "isrc",
        hsession.spark.range(4000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        n_buckets=4)
    catalog.register_all(hsession.spark)

    hsession.sql("INSERT INTO idst SELECT k, v FROM isrc "
                 "WHERE isrc.k < 500")
    rr = dict(hsession.last_select_route)
    assert rr.get("route") is not None
    assert rr["files_read"] < rr["files_total"]
    assert hsession.sql("SELECT count(*) AS n FROM idst").first().n \
        == 500

    hsession.sql("INSERT OVERWRITE idst SELECT k, v FROM isrc "
                 "WHERE isrc.k BETWEEN 100 AND 199")
    assert hsession.sql("SELECT count(*) AS n FROM idst").first().n \
        == 100

    # MERGE source SELECT routes the same way; answers exact
    hsession.sql("MERGE INTO idst USING (SELECT k, v + 1 AS v "
                 "FROM isrc WHERE isrc.k < 150) s ON idst.k = s.k "
                 "WHEN MATCHED THEN UPDATE SET v = s.v")
    got = sorted((r.k, r.v) for r in hsession.sql(
        "SELECT k, v FROM idst").collect())
    assert got[0] == (100, 201) and got[49] == (149, 299)
    assert got[50] == (150, 300)      # unmatched rows untouched
