"""Block-pair GEMM all-pairs cosine (similarity.cosine_all_pairs) and
the Arrow-path pair dot (pair_dot_pandas)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from heracles_spark.operators.similarity import (cosine_all_pairs,
                                                 pair_dot_pandas)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _py_cosine(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
        na += float(x) * float(x)
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def test_all_pairs_matches_python_exactly(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    got = {(r.id_a, r.id_b): r.cosine
           for r in cosine_all_pairs(_vecs(spark, rows), threshold=0.3,
                                     dim=8, n_blocks=4).collect()}
    want = {}
    for i in range(40):
        for j in range(i + 1, 40):
            c = round(_py_cosine([float(f) for f in _f32(rows[i][1])],
                                 [float(f) for f in _f32(rows[j][1])]), 6)
            if c >= 0.3:
                want[(i, j)] = c
    assert set(got) == set(want)


def _f32(xs):
    import numpy as np

    return np.asarray(xs, dtype=np.float32)


def test_all_pairs_cross_block_orientation(spark):
    # Regression: a pair whose id order disagrees with its block order
    # must still be emitted as (min_id, max_id). With identical vectors
    # every pair has cosine 1.0, so any dropped orientation shows up as
    # a missing pair.
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)]
    out = cosine_all_pairs(_vecs(spark, rows), threshold=0.99, dim=4,
                           n_blocks=3).collect()
    assert len(out) == 45  # C(10,2)
    assert all(r.id_a < r.id_b for r in out)
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in out)


def test_all_pairs_single_block_matches_multi(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(25)]
    one = {(r.id_a, r.id_b): r.cosine
           for r in cosine_all_pairs(_vecs(spark, rows), 0.2, dim=6,
                                     n_blocks=1).collect()}
    four = {(r.id_a, r.id_b): r.cosine
            for r in cosine_all_pairs(_vecs(spark, rows), 0.2, dim=6,
                                      n_blocks=4).collect()}
    assert one == four


def test_pair_dot_pandas_matches_sql_fold(spark):
    rows = [(1, [0.5, -1.25, 3.0], [2.0, 4.0, -0.5]),
            (2, [1.0, 1.0, 1.0], [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(
        rows, "pid long, va array<float>, vb array<float>")
    out = {r.pid: r["__dot"] for r in
           pair_dot_pandas(df, "va", "vb", 3, keep=["pid"]).collect()}
    for pid, va, vb in rows:
        acc = 0.0
        for x, y in zip(_f32(va), _f32(vb)):
            acc += float(x) * float(y)
        assert out[pid] == acc


def test_all_pairs_string_ids(spark):
    """id type follows the input column — string ids must survive the
    Arrow panel round-trip with correct pair orientation."""
    import random

    rng = random.Random(3)
    rows = [(f"doc-{i:03d}", [rng.uniform(-1, 1) for _ in range(6)])
            for i in range(25)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    got = {(r.id_a, r.id_b): r.cosine
           for r in cosine_all_pairs(df, threshold=0.2, dim=6,
                                     n_blocks=3).collect()}
    want = {}
    for i in range(25):
        for j in range(i + 1, 25):
            c = round(_py_cosine([float(f) for f in _f32(rows[i][1])],
                                 [float(f) for f in _f32(rows[j][1])]), 6)
            if c >= 0.2:
                a, b = sorted((rows[i][0], rows[j][0]))
                want[(a, b)] = c
    assert got == want and want
    assert all(a < b for a, b in got)
