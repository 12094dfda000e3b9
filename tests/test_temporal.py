"""As-of join and binned range join semantics on hand-built fixtures."""

from __future__ import annotations

import pytest

from heracles_spark.operators import temporal


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 205, "t2"), (1, 300, "t3"), (2, 150, "t4")],
        "sym int, ts long, trade string")
    quotes = spark.createDataFrame(
        [(1, 90, 10.0), (1, 200, 11.0), (1, 205, 12.0), (2, 500, 99.0)],
        "sym int, ts long, px double")
    return trades, quotes


def test_asof_backward(spark, trades_quotes):
    trades, quotes = trades_quotes
    j = temporal.asof_join(trades, quotes, on="ts", by="sym")
    got = {r["trade"]: r["px_right"] for r in j.collect()}
    assert got == {
        "t1": 10.0,   # latest quote <= 100 is ts=90
        "t2": 12.0,   # equal timestamp matches (<=)
        "t3": 12.0,   # carried forward
        "t4": None,   # no quote before 150 for sym 2
    }


def test_asof_preserves_left_rowcount(spark, trades_quotes):
    trades, quotes = trades_quotes
    assert temporal.asof_join(trades, quotes, on="ts", by="sym").count() == 4


def test_range_join_binned_exact(spark):
    left = spark.createDataFrame([(1, 1000, "p1"), (1, 2000, "p2")],
                                 "u int, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 399, "early"), (1, 400, "in1"), (1, 999, "in2"),
         (1, 1000, "excl"), (1, 1500, "in3"), (2, 900, "otheruser")],
        "u int, ts long, ev string")
    j = temporal.range_join_binned(left, right, by="u",
                                   left_ts="ts", right_ts="ts",
                                   lower=-600, upper=0, bin_width=250)
    got = sorted((r["tag"], r["ev"]) for r in j.collect())
    # window [ts-600, ts): p1 gets 400,999(no: 999<1000 yes); p2 gets 1500
    assert got == [("p1", "in1"), ("p1", "in2"), ("p2", "in3")]


def test_range_join_no_cross_product_plan(spark):
    """The rewrite must plan as an equi-join, not a nested loop."""
    from heracles_spark.plans import has_node

    left = spark.createDataFrame([(1, 1000)], "u int, ts long")
    right = spark.createDataFrame([(1, 900)], "u int, ts long")
    j = temporal.range_join_binned(left, right, "u", "ts", "ts",
                                   -600, 0, 300)
    assert not has_node(j, "BroadcastNestedLoopJoin")
    assert not has_node(j, "CartesianProduct")


def test_asof_forward_direction(spark):
    from heracles_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10), (1, 50), (2, 10)],
                                 "u long, t long")
    right = spark.createDataFrame([(1, 20, "a"), (1, 60, "b"),
                                   (2, 5, "c")], "u long, t long, v string")
    got = {(r.u, r.t): r.v_right for r in
           asof_join(left, right, on="t", by="u",
                     direction="forward").collect()}
    assert got == {(1, 10): "a", (1, 50): "b", (2, 10): None}


def test_asof_nearest_direction_and_ties(spark):
    from heracles_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 30), (1, 41)], "u long, t long")
    right = spark.createDataFrame([(1, 20, "b20"), (1, 40, "f40")],
                                  "u long, t long, v string")
    got = {(r.u, r.t): r.v_right for r in
           asof_join(left, right, on="t", by="u",
                     direction="nearest").collect()}
    # t=30: gap 10 both ways -> backward wins ties; t=41: 40 is closer
    assert got == {(1, 30): "b20", (1, 41): "f40"}


def test_asof_tolerance(spark):
    from heracles_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], "u long, t long")
    right = spark.createDataFrame([(1, 95, "near"), (1, 50, "far")],
                                  "u long, t long, v string")
    got = {(r.u, r.t): r.v_right for r in
           asof_join(left, right, on="t", by="u",
                     tolerance=10).collect()}
    assert got == {(1, 100): "near", (1, 200): None}


def test_asof_backward_unchanged(spark):
    """Default semantics must match the pre-direction implementation."""
    from heracles_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10), (1, 25)], "u long, t long")
    right = spark.createDataFrame([(1, 10, "eq"), (1, 20, "mid")],
                                  "u long, t long, v string")
    got = {(r.u, r.t): r.v_right for r in
           asof_join(left, right, on="t", by="u").collect()}
    assert got == {(1, 10): "eq", (1, 25): "mid"}


def test_events_ts_ns_session_tz_independent(spark):
    """ts_ns must be a pure function of the NTZ value: timestampdiff
    promotes NTZ to session-tz TIMESTAMP (an hour off inside DST
    transitions), so _events derives epoch micros by field extraction.
    Pin that under a DST-having session timezone."""
    from tests.conftest import SF_SMALL
    from heracles_spark.queries.relational import _events
    from heracles_spark import plancache

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        vals = {}
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            plancache.clear()
            vals[tz] = {r["event_id"]: r["ts_ns"] for r in
                        _events(spark, SF_SMALL)
                        .select("event_id", "ts_ns").limit(500).collect()}
        assert vals["UTC"] == vals["America/New_York"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
        plancache.clear()


# -- interval overlap join --------------------------------------------------

def test_interval_overlap_join_matches_brute(spark):
    import itertools
    import random

    from heracles_spark.operators.temporal import interval_overlap_join

    rng = random.Random(7)
    mk = lambda n: [(i, rng.randrange(0, 500),) for i in range(n)]
    lrows = [(k % 3, s, s + rng.randrange(1, 80), i)
             for i, (k, s) in enumerate((i % 3, rng.randrange(0, 500))
                                        for i in range(60))]
    rrows = [(k % 3, s, s + rng.randrange(1, 80), i)
             for i, (k, s) in enumerate((i % 3, rng.randrange(0, 500))
                                        for i in range(60))]
    l = spark.createDataFrame(lrows, "k long, ls long, le long, lid long")
    r = spark.createDataFrame(rrows, "k long, rs long, re long, rid long")
    got = sorted((x["lid"], x["rid"]) for x in
                 interval_overlap_join(l, r, "k", "ls", "le", "rs", "re",
                                       bin_width=32).collect())
    want = sorted((a[3], b[3]) for a, b in itertools.product(lrows, rrows)
                  if a[0] == b[0] and a[1] < b[2] and b[1] < a[2])
    assert got == want


def test_interval_overlap_join_no_duplicate_pairs(spark):
    from heracles_spark.operators.temporal import interval_overlap_join

    # long intervals span many bins — each pair must appear ONCE
    l = spark.createDataFrame([(1, 0, 1000, 1)], "k long, ls long, le long, lid long")
    r = spark.createDataFrame([(1, 500, 2000, 2)], "k long, rs long, re long, rid long")
    rows = interval_overlap_join(l, r, "k", "ls", "le", "rs", "re",
                                 bin_width=10).collect()
    assert len(rows) == 1


def test_interval_overlap_join_half_open(spark):
    from heracles_spark.operators.temporal import interval_overlap_join

    # touching intervals [0,10) and [10,20) do NOT overlap
    l = spark.createDataFrame([(1, 0, 10, 1)], "k long, ls long, le long, lid long")
    r = spark.createDataFrame([(1, 10, 20, 2)], "k long, rs long, re long, rid long")
    assert interval_overlap_join(l, r, "k", "ls", "le", "rs", "re",
                                 bin_width=8).count() == 0


def test_interval_overlap_join_property(spark):
    """Hypothesis: binned rewrite ≡ brute force for arbitrary interval
    sets and bin widths (one Spark round-trip per example set is slow,
    so examples are batched into one dataframe keyed by case id)."""
    import itertools

    from hypothesis import given, settings, strategies as st

    iv = st.tuples(st.integers(0, 200), st.integers(1, 120),
                   st.integers(0, 2))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(iv, min_size=1, max_size=12),
           st.lists(iv, min_size=1, max_size=12),
           st.sampled_from([1, 7, 64, 300]))
    def check(ls, rs, width):
        from heracles_spark.operators.temporal import interval_overlap_join

        lrows = [(k, s, s + d, i) for i, (s, d, k) in enumerate(ls)]
        rrows = [(k, s, s + d, i) for i, (s, d, k) in enumerate(rs)]
        l = spark.createDataFrame(lrows, "k long, ls long, le long, lid long")
        r = spark.createDataFrame(rrows, "k long, rs long, re long, rid long")
        got = sorted((x["lid"], x["rid"]) for x in
                     interval_overlap_join(l, r, "k", "ls", "le",
                                           "rs", "re", width).collect())
        want = sorted((a[3], b[3])
                      for a, b in itertools.product(lrows, rrows)
                      if a[0] == b[0] and a[1] < b[2] and b[1] < a[2])
        assert got == want

    check()


def test_decayed_sum_trailing_exact(spark):
    """Dyadic decayed sum equals the per-row Python fold exactly, and
    is partition-count independent."""
    from heracles_spark.operators.temporal import decayed_sum_trailing

    rows = [(1, t, float(v)) for t, v in
            enumerate([8, 4, 2, 100, 1, 7, 3], start=10)]
    rows += [(2, 1, 5.0), (2, 2, 9.0)]
    df = spark.createDataFrame(rows, "uid long, ts long, value double")
    got = {(r.uid, r.ts): r.decayed_sum for r in
           decayed_sum_trailing(df, "uid", "ts", "value",
                                window=3).collect()}
    by_user = {}
    for uid, ts, v in sorted(rows):
        by_user.setdefault(uid, []).append(v)
    for uid, vals in by_user.items():
        for i in range(len(vals)):
            want = sum(vals[i - k] * 2.0 ** -k
                       for k in range(3) if i - k >= 0)
            ts = (10 + i) if uid == 1 else (1 + i)
            assert got[(uid, ts)] == want, (uid, ts)
    got13 = {(r.uid, r.ts): r.decayed_sum for r in
             decayed_sum_trailing(df.repartition(13), "uid", "ts",
                                  "value", window=3).collect()}
    assert got13 == got


def test_densify_series_fills_gaps_exactly(spark):
    from pyspark.sql import functions as F

    from heracles_spark.operators.temporal import densify_series

    rows = [("a", "2024-03-10 00:00:00", 5),   # DST-transition day (US)
            ("a", "2024-03-10 03:00:00", 7),   # 2-hour gap
            ("b", "2024-03-10 01:00:00", 1)]   # single-point series
    df = spark.createDataFrame(rows, "g string, hr string, y long") \
              .withColumn("hr", F.col("hr").cast("timestamp_ntz"))
    dense = densify_series(df, ["g"], "hr", 3600, fill={"y": 0})
    got = {(r["g"], str(r["hr"])): r["y"] for r in dense.collect()}
    assert got == {
        ("a", "2024-03-10 00:00:00"): 5,
        ("a", "2024-03-10 01:00:00"): 0,
        ("a", "2024-03-10 02:00:00"): 0,   # NTZ: no spring-forward skip
        ("a", "2024-03-10 03:00:00"): 7,
        ("b", "2024-03-10 01:00:00"): 1,
    }
    # default fill is NULL
    dense_null = densify_series(df, ["g"], "hr", 3600)
    assert (dense_null.where(F.col("y").isNull()).count() == 2)
    # partition-count independence
    got17 = {(r["g"], str(r["hr"])): r["y"]
             for r in densify_series(df.repartition(17), ["g"], "hr",
                                     3600, fill={"y": 0}).collect()}
    assert got17 == got
