"""Key-range layout writer + file pruner.

Pruner scenarios model the reference's critical-point tests
(CriticalPointsTestSuite.scala:42-631; degenerate cases
HBasePartitionerSuite.scala:222-288: `k=8 OR k>8`, `k<8 AND k>8`)."""

from __future__ import annotations

from heracles_spark import writer
from heracles_spark.pruning import may_match, prune_files, scan, to_sql

COLS = [("col7", "int"), ("col1", "string"), ("col3", "smallint"),
        ("col4", "int")]
KEYS = ["col7", "col1", "col3"]  # ta/tb fixture key order (FIXTURES §2)


def _mk(catalog, spark, rows, n_buckets=4):
    catalog.create_table("ta", COLS, KEYS)
    df = spark.createDataFrame(rows, "col7 int, col1 string, col3 smallint, col4 int")
    return writer.write_key_organized(spark, catalog, "ta", df,
                                      n_buckets=n_buckets)


ROWS = [(k, f" p{abs(k)} " if k > 0 else f" n{abs(k)} ", 128, i)
        for i, k in enumerate([-257, -255, -129, -127, -33, -31, -1,
                               1, 31, 33, 127, 129, 255, 257])]


def test_layout_sorted_and_indexed(spark, catalog):
    tbl = _mk(catalog, spark, ROWS)
    assert len(tbl.files) >= 2
    # files must cover disjoint-ish sorted ranges on the leading key
    spans = sorted((f["min"]["col7"], f["max"]["col7"]) for f in tbl.files)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # range layout ⇒ non-overlapping leading key
    total = sum(f["rows"] for f in tbl.files)
    assert total == len(ROWS)


def test_pruned_scan_results(spark, catalog):
    _mk(catalog, spark, ROWS)
    got = scan(spark, catalog, "ta", ("=", "col7", 129)).collect()
    assert [r["col7"] for r in got] == [129]
    got = scan(spark, catalog, "ta",
               ("and", (">", "col7", 0), ("<=", "col7", 127))).collect()
    assert sorted(r["col7"] for r in got) == [1, 31, 33, 127]


def test_pruning_reduces_files(spark, catalog):
    tbl = _mk(catalog, spark, ROWS)
    kept = prune_files(tbl.files, ("=", "col7", 257), tbl.key_cols)
    assert 0 < len(kept) < len(tbl.files)


def test_may_match_degenerate_cases():
    mins, maxs = {"k": 0}, {"k": 10}
    # k=8 OR k>8 (satisfiable)
    assert may_match(("or", ("=", "k", 8), (">", "k", 8)), mins, maxs, ["k"])
    # k<8 AND k>8 (unsatisfiable — both legs individually satisfiable,
    # box logic keeps it; the residual filter removes rows. MAY is the
    # conservative correct answer)
    assert may_match(("and", ("<", "k", 8), (">", "k", 8)), mins, maxs, ["k"])
    # out-of-range point
    assert not may_match(("=", "k", 11), mins, maxs, ["k"])
    # boundary semantics
    assert may_match(("=", "k", 10), mins, maxs, ["k"])
    assert not may_match((">", "k", 10), mins, maxs, ["k"])
    assert may_match((">=", "k", 10), mins, maxs, ["k"])
    assert not may_match(("<", "k", 0), mins, maxs, ["k"])
    assert may_match(("between", "k", -5, 0), mins, maxs, ["k"])
    assert not may_match(("between", "k", 11, 20), mins, maxs, ["k"])
    assert may_match(("in", "k", [11, 5]), mins, maxs, ["k"])
    assert not may_match(("in", "k", [11, 12]), mins, maxs, ["k"])
    # IS NULL on key column is decidable: keys are non-nullable
    assert not may_match(("isnull", "k"), mins, maxs, ["k"])
    assert may_match(("isnull", "other"), mins, maxs, ["k"])
    assert may_match(("not", ("isnull", "k")), mins, maxs, ["k"])


def test_to_sql_rendering():
    p = ("and", ("=", "a", 1), ("or", ("in", "b", ["x", "y"]),
                                ("between", "c", 2, 3)))
    s = to_sql(p)
    assert s == "(`a` = 1 AND (`b` IN ('x', 'y') OR `c` BETWEEN 2 AND 3))"


def test_upsert_last_write_wins(spark, catalog):
    """HBase per-key upsert semantics, opt-in (SURVEY §7.2.3)."""
    catalog.create_table("u", [("k", "int"), ("v", "string")], ["k"])
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    writer.write_key_organized(spark, catalog, "u", df1)
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    writer.write_key_organized(spark, catalog, "u", df2)
    # append mode: 4 rows, key 2 twice
    assert catalog.read_table(spark, "u").count() == 4
    merged = spark.createDataFrame(
        catalog.read_table(spark, "u").collect(), "k int, v string")
    writer.write_key_organized(spark, catalog, "u", merged,
                               mode="overwrite", upsert=True)
    rows = {r["k"]: r["v"] for r in catalog.read_table(spark, "u").collect()}
    assert set(rows) == {1, 2, 3}


def test_csv_bulk_load_null_convention(spark, catalog, tmp_path):
    """Empty CSV field ⇒ NULL (HadoopReader.scala:41-56)."""
    catalog.create_table("blk", [("c1", "string"), ("c2", "int"), ("c3", "int")],
                         ["c1"])
    p = tmp_path / "loadData.txt"
    p.write_text("row1,,8\nrow2,5,10\nrow3,,\n")
    writer.bulk_load_csv(spark, catalog, "blk", str(p))
    rows = {r["c1"]: (r["c2"], r["c3"])
            for r in catalog.read_table(spark, "blk").collect()}
    assert rows == {"row1": (None, 8), "row2": (5, 10), "row3": (None, None)}


def test_nnf_negation_pushdown():
    """NOT subtrees become prunable after NNF (3VL-exact rewrites)."""
    from heracles_spark.pruning import prune_files, to_nnf

    files = [{"path": "a", "min": {"k": 0}, "max": {"k": 4}},
             {"path": "b", "min": {"k": 6}, "max": {"k": 9}},
             {"path": "c", "min": {"k": 10}, "max": {"k": 20}}]

    # NOT(k < 5) ≡ k >= 5 → file a pruned
    keep = prune_files(files, ("not", ("<", "k", 5)), ["k"])
    assert [f["path"] for f in keep] == ["b", "c"]

    # De Morgan: NOT(k >= 5 AND k <= 9) ≡ k<5 OR k>9 → file b pruned
    keep = prune_files(
        files, ("not", ("and", (">=", "k", 5), ("<=", "k", 9))), ["k"])
    assert [f["path"] for f in keep] == ["a", "c"]

    # NOT IN over a point file: box [3,3] with NOT(k IN (3, 99)) → NO...
    point = [{"path": "p", "min": {"k": 3}, "max": {"k": 3}}]
    assert prune_files(point, ("not", ("in", "k", [3, 99])), ["k"]) == []

    # NOT BETWEEN → out-of-range disjunction
    keep = prune_files(files, ("not", ("between", "k", 5, 25)), ["k"])
    assert [f["path"] for f in keep] == ["a"]

    # double negation cancels
    assert to_nnf(("not", ("not", ("=", "k", 3)))) == ("=", "k", 3)

    # unknown inner op survives conservatively
    assert to_nnf(("not", ("isnull", "k")))[0] == "isnotnull"


def test_or_of_ands_pruning_q19_shape():
    """Disjunctive predicates (TPC-H Q19 shape) prune per-branch —
    a file survives iff SOME branch may match its box."""
    from heracles_spark.pruning import prune_files

    files = [{"path": "a", "min": {"k": 0}, "max": {"k": 4}},
             {"path": "b", "min": {"k": 6}, "max": {"k": 9}},
             {"path": "c", "min": {"k": 10}, "max": {"k": 20}}]
    pred = ("or",
            ("and", (">=", "k", 1), ("<=", "k", 3)),
            ("and", (">=", "k", 11), ("<=", "k", 12)))
    keep = prune_files(files, pred, ["k"])
    assert [f["path"] for f in keep] == ["a", "c"]


# -- exactly-once per-batch append + OPTIMIZE --------------------------------

def _mk_kv(catalog, spark, n=100):
    catalog.create_table("kv", [("k", "int"), ("v", "int")], ["k"])
    df = spark.createDataFrame([(i, i * 10) for i in range(n)],
                               "k int, v int")
    return writer.write_key_organized(spark, catalog, "kv", df, n_buckets=4)


def test_append_batch_exactly_once_replay_is_noop(spark, catalog):
    """Re-delivering a committed batch (at-least-once foreachBatch) must
    not duplicate rows."""
    _mk_kv(catalog, spark)
    batch = spark.createDataFrame([(1000, 1), (1001, 2)], "k int, v int")
    writer.append_batch_exactly_once(spark, catalog, "kv", batch, batch_id=7)
    writer.append_batch_exactly_once(spark, catalog, "kv", batch, batch_id=7)
    got = catalog.read_table(spark, "kv")
    assert got.count() == 102
    assert got.where("k >= 1000").count() == 2
    # a NEW batch id appends normally
    writer.append_batch_exactly_once(spark, catalog, "kv", batch.selectExpr(
        "k + 10 AS k", "v"), batch_id=8)
    assert catalog.read_table(spark, "kv").count() == 104


def test_append_batch_completes_after_marker_crash(spark, catalog):
    """Crash AFTER the marker publish but BEFORE the file moves: the
    replay completes the pending moves from staging instead of
    re-staging (the marker is the commit point)."""
    import json
    import os

    tbl = _mk_kv(catalog, spark)
    batch = spark.createDataFrame([(2000, 5)], "k int, v int")
    # Stage manually to simulate the partial state.
    staging = tbl.data_dir.rstrip("/") + "~batch3stage"
    (batch.repartition(1).write.mode("overwrite").parquet(staging))
    staged = [f for f in os.listdir(staging) if f.endswith(".parquet")]
    moves = [[os.path.join(staging, fn),
              os.path.join(tbl.data_dir, f"b3-{fn}")] for fn in staged]
    commits = os.path.join(tbl.data_dir, "_batch_commits")
    os.makedirs(commits, exist_ok=True)
    with open(os.path.join(commits, "3.json"), "w") as fh:
        json.dump(moves, fh)
    # Replay with a DIFFERENT df (must be ignored — marker wins).
    decoy = spark.createDataFrame([(9999, 9)], "k int, v int")
    writer.append_batch_exactly_once(spark, catalog, "kv", decoy, batch_id=3)
    rows = {r.k: r.v for r in catalog.read_table(spark, "kv").collect()}
    assert rows.get(2000) == 5 and 9999 not in rows
    assert not os.path.exists(staging)


def test_optimize_restores_disjoint_ranges(spark, catalog, hsession):
    """After COW merges accrete overlapping files, OPTIMIZE rewrites to
    disjoint leading-key ranges with identical contents."""
    _mk_kv(catalog, spark)
    for b in range(3):
        batch = spark.createDataFrame(
            [(i, -b) for i in range(b, 100, 7)], "k int, v int")
        writer.append_batch_exactly_once(spark, catalog, "kv", batch,
                                         batch_id=b)
    tbl = catalog.get_table("kv")
    spans = sorted((f["min"]["k"], f["max"]["k"]) for f in tbl.files)
    assert any(hi1 > lo2 for (_, hi1), (lo2, _) in zip(spans, spans[1:]))
    before = sorted(map(tuple, catalog.read_table(spark, "kv").collect()))
    hsession.sql("OPTIMIZE kv")
    tbl = catalog.get_table("kv")
    spans = sorted((f["min"]["k"], f["max"]["k"]) for f in tbl.files)
    assert all(hi1 <= lo2 for (_, hi1), (lo2, _) in zip(spans, spans[1:]))
    after = sorted(map(tuple, catalog.read_table(spark, "kv").collect()))
    assert after == before


def test_append_batch_replay_refuses_lost_files(spark, catalog):
    """A marker-listed file missing from BOTH staging and its final path
    is committed data that was lost; the replay must raise instead of
    silently publishing a partial batch."""
    import os

    import pytest

    _mk_kv(catalog, spark)
    batch = spark.createDataFrame([(3000 + i, i) for i in range(50)],
                                  "k int, v int")
    writer.append_batch_exactly_once(spark, catalog, "kv", batch,
                                     batch_id=11, n_buckets=2)
    tbl = catalog.get_table("kv")
    victim = next(f["path"] for f in tbl.files if "b11-" in f["path"])
    os.remove(victim)
    with pytest.raises(IOError, match="data loss"):
        writer.append_batch_exactly_once(spark, catalog, "kv", batch,
                                         batch_id=11)


def test_vacuum_protects_pending_batch_files(spark, catalog):
    """Files named by a batch-commit marker survive VACUUM even before
    the file index references them (the crash window between marker
    publish and index commit), so the replay can still complete."""
    import json
    import os
    import shutil

    tbl = _mk_kv(catalog, spark)
    pend = os.path.join(tbl.data_dir, "b99-part-pending.parquet")
    shutil.copy(tbl.files[0]["path"], pend)
    commits = os.path.join(tbl.data_dir, "_batch_commits")
    os.makedirs(commits, exist_ok=True)
    with open(os.path.join(commits, "99.json"), "w") as fh:
        json.dump([[tbl.data_dir + "~batch99stage/x.parquet", pend]], fh)

    writer.vacuum_table(catalog, "kv")
    assert os.path.exists(pend)

    decoy = spark.createDataFrame([(1, 1)], "k int, v int")
    writer.append_batch_exactly_once(spark, catalog, "kv", decoy, batch_id=99)
    assert any("b99-" in f["path"] for f in catalog.get_table("kv").files)


def test_committed_batch_markers_pruned(spark, catalog):
    """Once batch N commits, markers < N can never replay again and are
    removed (bounds the VACUUM marker-protection set)."""
    import os

    tbl = _mk_kv(catalog, spark)
    commits = os.path.join(tbl.data_dir, "_batch_commits")
    for b in (1, 2):
        batch = spark.createDataFrame([(5000 + b, b)], "k int, v int")
        writer.append_batch_exactly_once(spark, catalog, "kv", batch,
                                         batch_id=b)
    names = sorted(os.listdir(commits))
    assert "1.json" not in names and "2.json" in names


def test_csv_bulk_load_quarantine(spark, catalog, tmp_path):
    """Quarantine ingest: malformed lines go to bad_records_dir as raw
    text; clean rows load; nothing malformed reaches the table."""
    from heracles_spark import writer

    catalog.create_table("q", [("k", "int"), ("v", "string"),
                               ("n", "int")], ["k"])
    src = tmp_path / "in.csv"
    src.write_text("1,a,10\n"
                   "oops_not_an_int,b,20\n"
                   "2,c,not_a_number\n"
                   "3,d,30\n")
    writer.bulk_load_csv(spark, catalog, "q", str(src),
                         bad_records_dir=str(tmp_path / "bad"))
    rows = sorted((r["k"], r["v"], r["n"]) for r in
                  catalog.read_table(spark, "q").collect())
    assert rows == [(1, "a", 10), (3, "d", 30)]
    bad = sorted(r["value"] for r in
                 spark.read.text(str(tmp_path / "bad")).collect())
    assert bad == ["2,c,not_a_number", "oops_not_an_int,b,20"]
