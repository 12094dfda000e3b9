"""Property-based soundness of the file pruner (hypothesis).

The pruner's contract (heracles_spark/pruning.py, ≙ the reference's
partialReduce MAY/NO logic, PartialPredicateOperations.scala:116-384) is
one-sided: ``may_match`` may answer MAY for a file that holds no
matching row (harmless over-read), but it must NEVER answer NO for a
file that contains one (that would drop rows). These tests hammer that
invariant with random predicates over random integer files, and check
``to_nnf`` is an exact rewrite under row-keeping semantics.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from heracles_spark.pruning import may_match, to_nnf

COLS = ["a", "b"]

_vals = st.integers(min_value=-5, max_value=5)


def _leaf():
    cmp_ops = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])
    col = st.sampled_from(COLS)
    return st.one_of(
        st.tuples(cmp_ops, col, _vals),
        st.tuples(st.just("in"), col,
                  st.lists(_vals, min_size=1, max_size=4)),
        st.tuples(st.just("between"), col, _vals, _vals),
        st.tuples(st.just("isnull"), col),
        st.tuples(st.just("isnotnull"), col),
    )


def _pred():
    return st.recursive(
        _leaf(),
        lambda children: st.one_of(
            st.tuples(st.just("and"), children, children),
            st.tuples(st.just("or"), children, children),
            st.tuples(st.just("not"), children),
        ),
        max_leaves=8,
    )


def _rows():
    cell = st.one_of(st.none(), _vals)
    return st.lists(st.fixed_dictionaries({c: cell for c in COLS}),
                    min_size=1, max_size=6)


def eval_pred(pred, row):
    """3-valued SQL evaluation: True / False / None (unknown)."""
    op = pred[0].lower()
    if op == "and":
        vs = [eval_pred(p, row) for p in pred[1:]]
        if any(v is False for v in vs):
            return False
        return None if any(v is None for v in vs) else True
    if op == "or":
        vs = [eval_pred(p, row) for p in pred[1:]]
        if any(v is True for v in vs):
            return True
        return None if any(v is None for v in vs) else False
    if op == "not":
        v = eval_pred(pred[1], row)
        return None if v is None else (not v)
    col = pred[1]
    v = row[col]
    if op == "isnull":
        return v is None
    if op == "isnotnull":
        return v is not None
    if v is None:
        return None
    if op == "=":
        return v == pred[2]
    if op == "!=":
        return v != pred[2]
    if op == "<":
        return v < pred[2]
    if op == "<=":
        return v <= pred[2]
    if op == ">":
        return v > pred[2]
    if op == ">=":
        return v >= pred[2]
    if op == "in":
        return v in pred[2]
    if op == "between":
        return pred[2] <= v <= pred[3]
    raise AssertionError(op)


def _box(rows):
    """File min/max stats exactly as harvest_file_index records them:
    per column over non-null values; absent when all-null."""
    mins, maxs = {}, {}
    for c in COLS:
        vals = [r[c] for r in rows if r[c] is not None]
        if vals:
            mins[c] = min(vals)
            maxs[c] = max(vals)
    return mins, maxs


@settings(max_examples=400, deadline=None)
@given(_pred(), _rows())
def test_may_match_never_drops_a_matching_row(pred, rows):
    """If any row in the file satisfies the predicate (TRUE — SQL keeps
    the row), the pruner must keep the file. Key-col claim ('key columns
    are non-nullable') is not assumed here: key_cols=[] models plain
    non-key stats."""
    mins, maxs = _box(rows)
    if any(eval_pred(to_nnf(pred), row) is True for row in rows):
        assert may_match(to_nnf(pred), mins, maxs, key_cols=[]) is not False


@settings(max_examples=400, deadline=None)
@given(_pred(), _rows())
def test_to_nnf_is_exact_under_row_keeping(pred, rows):
    """to_nnf must preserve which rows are KEPT (evaluate TRUE) — the
    semantics WHERE uses — including through NULLs and De Morgan."""
    nnf = to_nnf(pred)
    for row in rows:
        assert (eval_pred(pred, row) is True) == (eval_pred(nnf, row) is True)


def _rows_nonnull():
    return st.lists(st.fixed_dictionaries({c: _vals for c in COLS}),
                    min_size=1, max_size=6)


@settings(max_examples=400, deadline=None)
@given(_pred(), _rows_nonnull())
def test_must_match_implies_every_row_true(pred, rows):
    """Round-12: ``must_match`` is ALL-rows sound — a file it marks
    fully contained has EVERY row evaluating TRUE. Rows are non-null
    here because the claim is only made over key columns, which are
    non-nullable by construction."""
    from heracles_spark.pruning import must_match

    mins, maxs = _box(rows)
    nnf = to_nnf(pred)
    if must_match(nnf, mins, maxs, key_cols=COLS):
        assert all(eval_pred(nnf, row) is True for row in rows)


# --- round-13: extended footer stats (non-key boxes + null counts) --

def test_null_count_aware_may_and_must_match():
    """may_match decides the NULL tests from per-file null counts
    (zero nulls => IS NULL prunes; all-null => comparisons and IS NOT
    NULL prune), and must_match certifies non-key columns whose null
    count is zero for the file."""
    from heracles_spark.pruning import may_match, must_match, to_nnf

    mins, maxs = {"v": 10, "k": 0}, {"v": 20, "k": 9}
    # zero nulls: IS NULL can never hold
    assert may_match(("isnull", "v"), mins, maxs, ["k"],
                     {"v": 0}, 100) is False
    # some nulls: IS NULL may hold
    assert may_match(("isnull", "v"), mins, maxs, ["k"],
                     {"v": 3}, 100) is True
    # all-null column: comparisons and IS NOT NULL can never hold
    assert may_match(("isnotnull", "s"), mins, maxs, ["k"],
                     {"s": 100}, 100) is False
    assert may_match(("=", "s", 5), mins, maxs, ["k"],
                     {"s": 100}, 100) is False
    # without null info everything stays conservative
    assert may_match(("isnull", "v"), mins, maxs, ["k"]) is True
    assert may_match(("isnotnull", "s"), mins, maxs, ["k"]) is True

    # must_match: non-key column provably non-null for THIS file
    assert must_match(to_nnf(("between", "v", 0, 50)), mins, maxs,
                      ["k"], {"v": 0}, 100) is True
    assert must_match(to_nnf(("between", "v", 0, 15)), mins, maxs,
                      ["k"], {"v": 0}, 100) is False   # box not inside
    # nullable (or unknown) non-key column: never provable
    assert must_match(to_nnf(("between", "v", 0, 50)), mins, maxs,
                      ["k"], {"v": 1}, 100) is False
    assert must_match(to_nnf(("between", "v", 0, 50)), mins, maxs,
                      ["k"]) is False
    # key columns keep their round-12 guarantees without null info
    assert must_match(to_nnf(("between", "k", 0, 9)), mins, maxs,
                      ["k"]) is True


def test_harvest_records_nonkey_boxes_and_null_counts(
        spark, catalog, tmp_path):
    """The footer harvest records min/max for every column plus
    per-column null counts; an all-NULL column contributes its null
    count but no box."""
    from pyspark.sql import functions as F

    from heracles_spark import writer

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.when(F.col("id") % 4 == 0, None)
         .otherwise(F.col("id").cast("string")).alias("s"),
        F.lit(None).cast("double").alias("allnull"))
    catalog.create_table(
        "hnb", [("k", "bigint"), ("v", "bigint"), ("s", "string"),
                ("allnull", "double")], ["k"])
    writer.write_key_organized(spark, catalog, "hnb", df, n_buckets=2)
    tbl = catalog.get_table("hnb")
    assert len(tbl.files) == 2
    tot_nulls = 0
    for f in tbl.files:
        assert {"k", "v"} <= set(f["min"]) and {"k", "v"} <= set(f["max"])
        assert f["min"]["v"] == f["min"]["k"] * 3
        assert f["max"]["v"] == f["max"]["k"] * 3
        assert "allnull" not in f["min"]          # no box for all-null
        nulls = f.get("nulls", {})
        assert nulls.get("k") == 0 and nulls.get("v") == 0
        assert nulls.get("allnull") == f["rows"]
        tot_nulls += nulls.get("s", 0)
    assert tot_nulls == 25
