"""Unit tests for the third curation batch: triangle counting,
Hamilton apportionment + stratified sampling, and the entity-resolution
composition pieces."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from heracles_spark.operators.graph import triangle_count
from heracles_spark.operators.sampling import (hamilton_allocation,
                                               stratified_sample_n)


# -- triangle counting -----------------------------------------------------

def _brute_triangles(edges):
    nodes = sorted({x for e in edges for x in e})
    eset = {frozenset(e) for e in edges if e[0] != e[1]}
    return sum(1 for a, b, c in itertools.combinations(nodes, 3)
               if {frozenset((a, b)), frozenset((b, c)),
                   frozenset((a, c))} <= eset)


def test_triangle_count_hand_graph(spark):
    # K4 on {1..4} (4 triangles) plus a pendant edge and a duplicate /
    # reversed / self-loop noise row
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, "u long, v long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7      # 6 K4 edges + pendant; dups/loops gone


def test_triangle_count_matches_bruteforce(spark):
    # deterministic pseudo-random graph on 20 nodes
    edges = [(a, b) for a in range(20) for b in range(a + 1, 20)
             if (a * 31 + b * 17) % 5 == 0]
    df = spark.createDataFrame(edges, "u long, v long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == _brute_triangles(edges)
    assert row["n_edges"] == len(edges)


def test_triangle_count_triangle_free(spark):
    # bipartite graphs have no triangles
    edges = [(a, 100 + b) for a in range(5) for b in range(5)]
    df = spark.createDataFrame(edges, "u long, v long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 0


# -- Hamilton allocation ---------------------------------------------------

def _hamilton_ref(sizes: dict, n_total: int) -> dict:
    tot = sum(sizes.values())
    base = {g: (n_total * n) // tot for g, n in sizes.items()}
    rem = {g: (n_total * n) % tot for g, n in sizes.items()}
    leftover = n_total - sum(base.values())
    order = sorted(sizes, key=lambda g: (-rem[g], g))
    for g in order[:leftover]:
        base[g] += 1
    return {g: min(base[g], sizes[g]) for g in sizes}


@pytest.mark.parametrize("sizes,n_total", [
    ({"a": 10, "b": 20, "c": 70}, 10),
    ({"a": 1, "b": 1, "c": 1}, 2),            # leftover goes to name order
    ({"a": 333, "b": 333, "c": 334}, 100),
    ({"a": 5, "b": 100000}, 50),              # tiny stratum capped at size
    ({"x": 7}, 1000),                         # alloc capped at group size
])
def test_hamilton_allocation_matches_reference(spark, sizes, n_total):
    df = spark.createDataFrame(list(sizes.items()), "g string, n long")
    got = {r["g"]: r["alloc"]
           for r in hamilton_allocation(df, "g", "n", n_total).collect()}
    assert got == _hamilton_ref(sizes, n_total)


def test_hamilton_allocation_sums_to_total(spark):
    sizes = {f"g{i}": 997 * (i + 1) % 400 + 1 for i in range(17)}
    df = spark.createDataFrame(list(sizes.items()), "g string, n long")
    got = hamilton_allocation(df, "g", "n", 200).collect()
    assert sum(r["alloc"] for r in got) == 200   # no stratum hit its cap


# -- stratified sampling ---------------------------------------------------

@pytest.fixture()
def strat_df(spark):
    rows = [(i, "t%d" % (i % 3)) for i in range(500)]
    return spark.createDataFrame(rows, "event_id long, event_type string")


def test_stratified_sample_n_two_phase_equals_naive(strat_df):
    salted = stratified_sample_n(strat_df, "event_type", 60, "event_id",
                                 n_salt=8)
    naive = stratified_sample_n(strat_df, "event_type", 60, "event_id",
                                n_salt=None)
    assert sorted(r["event_id"] for r in salted.collect()) == \
           sorted(r["event_id"] for r in naive.collect())


def test_stratified_sample_n_counts_and_determinism(strat_df):
    s = stratified_sample_n(strat_df, "event_type", 60, "event_id")
    got = s.groupBy("event_type").count().collect()
    assert {r["event_type"]: r["count"] for r in got} == \
           {"t0": 20, "t1": 20, "t2": 20}    # 500 rows: 167/167/166 → 20 ea
    # membership is a pure function of ids: repartitioning cannot move it
    s2 = stratified_sample_n(strat_df.repartition(13), "event_type", 60,
                             "event_id")
    assert sorted(r["event_id"] for r in s.collect()) == \
           sorted(r["event_id"] for r in s2.collect())


def test_stratified_sample_n_membership_is_hash_bottom_k(spark):
    import hashlib

    rows = [(i, "only") for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    s = stratified_sample_n(df, "event_type", 10, "event_id")
    got = sorted(r["event_id"] for r in s.collect())
    want = sorted(range(50),
                  key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                 i))[:10]
    assert got == sorted(want)
