"""Similarity search: brute-force exactness, LSH/IVF recall."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from heracles_spark.operators import similarity

DIM = 16


def _vec(seed: int) -> list[float]:
    import random

    r = random.Random(seed)
    return [r.gauss(0, 1) for _ in range(DIM)]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [(i, _vec(i)) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_brute_force_matches_python(spark, vecs):
    q = _vec(9999)
    got = [r["vec_id"] for r in similarity.cosine_topk(vecs, q, k=5).collect()]
    expect = sorted(range(200),
                    key=lambda i: (-round(_cosine(_vec(i), q), 6), i))[:5]
    assert got == expect


def test_lsh_recall(spark, vecs):
    """ANN with hamming-1 expansion should recover most of the true top-10."""
    q = _vec(123)
    exact = {r["vec_id"] for r in similarity.cosine_topk(vecs, q, k=10).collect()}
    ann = {r["vec_id"] for r in similarity.ann_topk_lsh(
        vecs, q, k=10, n_planes=6, dim=DIM).collect()} if False else {
        r["vec_id"] for r in similarity.ann_topk_lsh(
            vecs, q, k=10, n_planes=6).collect()}
    # recall ≥ 0.3 is the sanity bar for 6 planes + hamming-1 on 200 vecs
    assert len(ann & exact) >= 3


def test_ivf_probe(spark, vecs):
    q = _vec(77)
    with_cells = similarity.ivf_build(vecs, n_cells=8, dim=DIM)
    assert with_cells.select("cell_id").distinct().count() > 1
    got = similarity.ivf_topk(with_cells, q, k=5, n_probe=8, n_cells=8)
    exact = [r["vec_id"] for r in similarity.cosine_topk(vecs, q, k=5).collect()]
    # probing ALL cells == exhaustive ⇒ must equal brute force
    assert [r["vec_id"] for r in got.collect()] == exact


def test_ivf_partial_probe_subset(spark, vecs):
    q = _vec(55)
    with_cells = similarity.ivf_build(vecs, n_cells=8, dim=DIM)
    part = {r["vec_id"] for r in
            similarity.ivf_topk(with_cells, q, k=5, n_probe=2, n_cells=8).collect()}
    assert len(part) == 5


def test_kmeans_centroids_deterministic(spark, vecs):
    c1 = similarity.kmeans_centroids(vecs, n_cells=8, sample_size=200)
    c2 = similarity.kmeans_centroids(vecs, n_cells=8, sample_size=200)
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0]) == DIM
    # spherical k-means keeps centroids unit-norm
    for c in c1:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_kmeans_ivf_recall_not_worse_than_fixed(spark, vecs):
    """Trained centroids must not lose recall vs the fixed pseudo-random
    seeding at the same n_probe budget (averaged over queries)."""
    trained = similarity.kmeans_centroids(vecs, n_cells=8, sample_size=200)
    built_t = similarity.ivf_build(vecs, centroids=trained)
    built_f = similarity.ivf_build(vecs, n_cells=8, dim=DIM)

    def recall(built, q, cents=None):
        exact = {r["vec_id"] for r in
                 similarity.cosine_topk(vecs, q, k=10).collect()}
        got = {r["vec_id"] for r in similarity.ivf_topk(
            built, q, k=10, n_probe=2, n_cells=8, centroids=cents).collect()}
        return len(got & exact)

    qs = [_vec(s) for s in (301, 302, 303)]
    r_t = sum(recall(built_t, q, trained) for q in qs)
    r_f = sum(recall(built_f, q) for q in qs)
    assert r_t >= r_f
    assert r_t >= 15  # ≥50% avg recall at 2/8 probes on trained cells


def test_kmeans_ivf_full_probe_exact(spark, vecs):
    trained = similarity.kmeans_centroids(vecs, n_cells=8, sample_size=200)
    built = similarity.ivf_build(vecs, centroids=trained)
    q = _vec(77)
    got = [r["vec_id"] for r in similarity.ivf_topk(
        built, q, k=5, n_probe=8, centroids=trained).collect()]
    exact = [r["vec_id"] for r in similarity.cosine_topk(vecs, q, k=5).collect()]
    assert got == exact


def test_batch_topk_matches_single(spark, vecs):
    """Batch result per query == the single-query operator's top-k."""
    queries = (vecs.where(F.col("vec_id") < 3)
                   .select(F.col("vec_id").alias("qid"),
                           F.col("embedding").alias("qvec")))
    cand = vecs.where(F.col("vec_id") >= 3)
    batch = similarity.cosine_topk_batch(cand, queries, k=5, dim=DIM)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    for qid in range(3):
        qvec = [float(v) for v in
                vecs.where(F.col("vec_id") == qid).first()["embedding"]]
        single = [r["vec_id"] for r in
                  similarity.cosine_topk(cand, qvec, k=5).collect()]
        assert [v for _, v in sorted(got[qid])] == single


def test_ivf_batch_full_probe_matches_brute(spark, vecs):
    queries = (vecs.where(F.col("vec_id") < 3)
                   .select(F.col("vec_id").alias("qid"),
                           F.col("embedding").alias("qvec")))
    cand = vecs.where(F.col("vec_id") >= 3)
    cents = similarity.kmeans_centroids(cand, n_cells=8, sample_size=200)
    built = similarity.ivf_build(cand, centroids=cents)
    full = similarity.ivf_topk_batch(built, queries, cents, k=5, n_probe=8)
    brute = similarity.cosine_topk_batch(cand, queries, k=5, dim=DIM)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, brute.collect()))


def test_ivf_batch_partial_probe_recall(spark, vecs):
    queries = (vecs.where(F.col("vec_id") < 5)
                   .select(F.col("vec_id").alias("qid"),
                           F.col("embedding").alias("qvec")))
    cand = vecs.where(F.col("vec_id") >= 5)
    cents = similarity.kmeans_centroids(cand, n_cells=8, sample_size=200)
    built = similarity.ivf_build(cand, centroids=cents)
    part = similarity.ivf_topk_batch(built, queries, cents, k=5, n_probe=2)
    brute = similarity.cosine_topk_batch(cand, queries, k=5, dim=DIM)
    exact = {(r["qid"], r["vec_id"]) for r in brute.collect()}
    got = {(r["qid"], r["vec_id"]) for r in part.collect()}
    # every query returns k rows; recall >= 50% on trained cells
    assert len(got) == 25
    assert len(got & exact) >= 13


def test_ivf_cell_partitioned_storage_prunes(spark, vecs, tmp_path):
    """The IVF scale claim made concrete: cell-partitioned parquet + a
    cell_id filter ⇒ the scan reads ONLY the probed cells' files
    (partition pruning), not the whole dataset."""
    cents = similarity.kmeans_centroids(vecs, n_cells=8, sample_size=200)
    built = similarity.ivf_build(vecs, centroids=cents)
    path = str(tmp_path / "ivf_store")
    built.write.partitionBy("cell_id").parquet(path)

    stored = spark.read.parquet(path)
    probed = stored.where(F.col("cell_id").isin([0, 1]))
    # input_file_name() reflects the files the pruned scan actually read
    # (inputFiles() lists the relation pre-pruning).
    probed_files = {r[0] for r in
                    probed.select(F.input_file_name()).distinct().collect()}
    all_files = {r[0] for r in
                 stored.select(F.input_file_name()).distinct().collect()}
    assert probed_files and probed_files < all_files
    assert all(("cell_id=0" in f) or ("cell_id=1" in f) for f in probed_files)
    # and PartitionFilters appear in the physical plan
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell_id" in plan.split(
        "PartitionFilters")[1][:120]
    # and the probed read returns exactly the cells' rows
    expect = built.where(F.col("cell_id").isin([0, 1])).count()
    assert probed.count() == expect


# -- int8 quantization ----------------------------------------------------

def test_quantize_int8_roundtrip(spark, vecs):
    q = similarity.quantize_int8(vecs, dim=DIM).where(F.col("vec_id") < 20)
    for r in q.collect():
        orig = [float(v) for v in r["embedding"]]
        am = max(abs(v) for v in orig)
        assert abs(r["qscale"] - am / 127.0) < 1e-12
        assert all(-127 <= v <= 127 for v in r["qvec"])
        # reconstruction within half a quantization step per component
        for x, qi in zip(orig, r["qvec"]):
            assert abs(x - qi * r["qscale"]) <= r["qscale"] / 2 + 1e-9


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0] * DIM)],
                               "vec_id long, embedding array<float>")
    r = similarity.quantize_int8(df, dim=DIM).collect()[0]
    assert r["qscale"] == 0.0 and all(v == 0 for v in r["qvec"])


def test_quantize_vec_matches_plan_side(spark, vecs):
    """Driver-side quantizer must be bit-identical to the in-plan one."""
    rows = similarity.quantize_int8(vecs, dim=DIM).where(
        F.col("vec_id") < 10).collect()
    for r in rows:
        qv, scale = similarity.quantize_vec_int8(
            [float(v) for v in r["embedding"]])
        assert qv == list(r["qvec"]) and abs(scale - r["qscale"]) < 1e-15


def test_quantized_topk_close_to_exact(spark, vecs):
    """int8 cosine ranking should broadly agree with exact ranking."""
    q = _vec(777)
    exact = [r["vec_id"] for r in
             similarity.cosine_topk(vecs, q, k=10).collect()]
    quant = [r["vec_id"] for r in
             similarity.quantized_cosine_topk(vecs, q, k=10,
                                              dim=DIM).collect()]
    assert len(set(exact) & set(quant)) >= 8


# -- decontamination ------------------------------------------------------

def test_decontaminate_drops_overlapping_docs(spark):
    from heracles_spark.operators.text import decontaminate

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated content about spark engines here"),
         (3, "another clean document with no overlap at all")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "benchmark contains the quick brown fox jumps over it")],
        "doc_id long, text string")
    kept = {r["doc_id"]
            for r in decontaminate(train, ev, n=5).collect()}
    assert kept == {2, 3}          # doc 1 shares 'the quick brown fox jumps'


def test_decontaminate_short_doc_whole_text_gram(spark):
    from heracles_spark.operators.text import decontaminate

    train = spark.createDataFrame([(1, "tiny doc"), (2, "other text")],
                                  "doc_id long, text string")
    ev = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(train, ev, n=5).collect()}
    assert kept == {2}             # short docs compare whole-text


# -- product quantization ---------------------------------------------------

@pytest.fixture(scope="module")
def pq_books(vecs):
    return similarity.pq_train(vecs, m=4, k=8, dim=DIM, sample_size=200)


def test_pq_train_shapes(pq_books):
    assert len(pq_books) == 4
    assert all(len(b) == 8 for b in pq_books)
    assert all(len(c) == DIM // 4 for b in pq_books for c in b)


def test_pq_encode_codes(spark, vecs, pq_books):
    enc = similarity.pq_encode(vecs, pq_books).collect()
    assert len(enc) == 200
    for r in enc:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])


def test_pq_encode_matches_numpy(spark, vecs, pq_books):
    """In-plan encoding must pick the same centroids as a numpy argmin."""
    import numpy as np

    enc = {r["vec_id"]: list(r["codes"]) for r in
           similarity.pq_encode(vecs, pq_books).collect()}
    sub = DIM // 4
    for vid in range(0, 50, 7):
        x = np.asarray(_vec(vid))
        for s in range(4):
            xs = x[s * sub:(s + 1) * sub]
            d2 = [((xs - np.asarray(c)) ** 2).sum() for c in pq_books[s]]
            assert enc[vid][s] == int(np.argmin(d2))


def test_pq_adc_recall(spark, vecs, pq_books):
    """ADC ranking must recover most of the true dot-product top-10."""
    q = _vec(555)
    exact = [r["vec_id"] for r in
             similarity.cosine_topk(vecs, q, k=10).collect()]
    enc = similarity.pq_encode(vecs, pq_books)
    adc = [r["vec_id"] for r in
           similarity.pq_topk_adc(enc, q, pq_books, kk=10).collect()]
    assert len(set(exact) & set(adc)) >= 4   # 4 subspaces x 8 codes is coarse


def test_ivfpq_recall(spark, vecs, pq_books):
    """IVF-PQ composition: probing half the cells with coarse PQ codes
    must still recover a good chunk of the true top-10."""
    q = _vec(888)
    cents = similarity.kmeans_centroids(vecs, n_cells=8, sample_size=200)
    exact = [r["vec_id"] for r in
             similarity.cosine_topk(vecs, q, k=10).collect()]
    got = [r["vec_id"] for r in
           similarity.ivfpq_topk(vecs, q, pq_books, cents, kk=10,
                                 n_probe=4).collect()]
    assert len(got) == 10
    assert len(set(exact) & set(got)) >= 3


# -- KMV distinct sketches ---------------------------------------------------

def test_kmv_sketch_exact_when_small(spark):
    from heracles_spark.operators import sketches

    rows = ([("a", i) for i in range(40)]           # A = 0..39
            + [("b", i) for i in range(20, 70)])    # B = 20..69
    df = spark.createDataFrame(rows, "s string, member long")
    sk = sketches.kmv_sketch(df, "s", "member", k=256)
    est = sketches.kmv_compare(sk, "s", "a", "b", k=256).collect()[0]
    # union 70 < k: everything exact
    assert est["est_union"] == 70.0
    assert est["est_jaccard"] == round(20 / 70, 6)
    assert est["est_intersection"] == round(round(20 / 70, 6) * 70, 4)


def test_kmv_sketch_estimates_large_sets(spark):
    from heracles_spark.operators import sketches

    rows = ([("a", i) for i in range(4000)]
            + [("b", i) for i in range(2000, 6000)])
    df = spark.createDataFrame(rows, "s string, member long")
    sk = sketches.kmv_sketch(df, "s", "member", k=256)
    est = sketches.kmv_compare(sk, "s", "a", "b", k=256).collect()[0]
    # true union 6000, jaccard 2000/6000=0.333, intersection 2000
    assert abs(est["est_union"] - 6000) / 6000 < 0.25
    assert abs(est["est_jaccard"] - 1 / 3) < 0.12
    assert abs(est["est_intersection"] - 2000) / 2000 < 0.35


def test_kmv_sketch_partition_independent(spark):
    from heracles_spark.operators import sketches

    rows = [("a", i * 7) for i in range(1000)] + \
           [("b", i * 11) for i in range(1000)]
    df = spark.createDataFrame(rows, "s string, member long")
    e1 = sketches.kmv_compare(
        sketches.kmv_sketch(df, "s", "member"), "s", "a", "b").collect()[0]
    e2 = sketches.kmv_compare(
        sketches.kmv_sketch(df.repartition(13), "s", "member"),
        "s", "a", "b").collect()[0]
    assert e1.asDict() == e2.asDict()


def test_kmv_sketch_property_exact_below_k(spark):
    """Hypothesis: whenever |A ∪ B| < k the KMV estimates are EXACT."""
    from hypothesis import given, settings, strategies as st

    from heracles_spark.operators import sketches

    @settings(max_examples=8, deadline=None)
    @given(st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
           st.sets(st.integers(0, 10_000), min_size=1, max_size=60))
    def check(a, b):
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "s string, member long")
        sk = sketches.kmv_sketch(df, "s", "member", k=256)
        est = sketches.kmv_compare(sk, "s", "a", "b",
                                   k=256).collect()[0]
        u, i = len(a | b), len(a & b)
        assert est["est_union"] == float(u)
        assert est["est_jaccard"] == round(i / u, 6)

    check()


def test_ivf_partitioned_store_prunes_and_matches(spark, vecs, tmp_path):
    """ivf_write_partitioned: the probe over the cell-partitioned store
    (a) carries a PartitionFilters clause on cell_id (hive partition
    pruning — unprobed cells never open), and (b) returns exactly the
    same top-k as probing the in-memory built DataFrame."""
    import re

    from heracles_spark.plans import executed_plan_string

    q = _vec(4242)
    cents = similarity.kmeans_centroids(vecs, n_cells=8, sample_size=128)
    built = similarity.ivf_build(vecs, centroids=cents, dim=DIM)
    path = str(tmp_path / "ivfstore")
    similarity.ivf_write_partitioned(built, path)

    stored = spark.read.parquet(path)
    got_stored = similarity.ivf_topk(stored, q, k=5, n_probe=3,
                                     centroids=cents).collect()
    got_mem = similarity.ivf_topk(built, q, k=5, n_probe=3,
                                  centroids=cents).collect()
    assert [(r.vec_id, r.cosine) for r in got_stored] == \
           [(r.vec_id, r.cosine) for r in got_mem]

    plan = executed_plan_string(
        similarity.ivf_topk(stored, q, k=5, n_probe=3, centroids=cents))
    m = re.search(r"PartitionFilters: \[([^\]]*cell_id[^\]]*)\]", plan)
    assert m, plan
    # and the store really is laid out one directory per cell
    import os
    cells = [d for d in os.listdir(path) if d.startswith("cell_id=")]
    assert len(cells) >= 2


def test_covariance_accumulate_exact_and_partition_independent(spark, vecs):
    """covariance_accumulate equals a numpy reference exactly (integer
    microunits) and is invariant under repartitioning; pca_from_gram
    recovers the dominant directions of an anisotropic cloud."""
    import numpy as np

    rows = vecs.collect()
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    xr = x * 1_000_000
    xm = (np.sign(xr) * np.floor(np.abs(xr) + 0.5)).astype(np.int64)
    want = xm.T @ xm

    got = similarity.covariance_accumulate(vecs, dim=DIM).collect()
    assert len(got) == DIM * (DIM + 1) // 2
    for r in got:
        assert r.s == want[r.i, r.j], (r.i, r.j)
        assert r.n == len(rows)
    got2 = similarity.covariance_accumulate(
        vecs.repartition(7), dim=DIM).collect()
    assert sorted((r.i, r.j, r.s) for r in got2) == \
           sorted((r.i, r.j, r.s) for r in got)

    # stretched cloud: first axis dominates the spectrum
    stretched = vecs.selectExpr(
        "vec_id",
        "transform(embedding, (v, d) -> CASE WHEN d = 0 THEN v * 10 "
        "ELSE v END) AS embedding")
    g = similarity.covariance_accumulate(stretched, dim=DIM).collect()
    w, comps, n = similarity.pca_from_gram(
        [r.asDict() for r in g], dim=DIM, k=2)
    assert n == len(rows)
    assert w[0] > 10 * w[1]
    assert abs(comps[0][0]) > 0.99   # first component ≈ axis 0


def test_random_projection_matches_python_recompute(spark, vecs):
    """Integer-exact JL projection: every projected coordinate equals
    the python recomputation over the same microunit quantization and
    the same md5-derived sign matrix, and sq_dist_long equals the
    brute-force squared distance."""
    k = 4
    p = similarity.random_projection_micro(vecs, k=k, dim=DIM)
    rows = {r["vec_id"]: r for r in p.collect()}
    signs = similarity.jl_sign_matrix(k, DIM)
    src = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    for vid, r in rows.items():
        em = [round(float(x) * 1_000_000) for x in src[vid]]
        assert r["emb_micro"] == em
        for j in range(k):
            assert r["proj"][j] == sum(
                e * s for e, s in zip(em, signs[j]))

    ids = sorted(rows)
    a, b = ids[0], ids[1]
    got = (p.where(F.col("vec_id") == a)
            .crossJoin(p.where(F.col("vec_id") == b)
                        .select(F.col("emb_micro").alias("mb")))
            .select(similarity.sq_dist_long(
                F.col("emb_micro"), F.col("mb")).alias("d"))
            .first()["d"])
    ea = [round(float(x) * 1_000_000) for x in src[a]]
    eb = [round(float(x) * 1_000_000) for x in src[b]]
    assert got == sum((x - y) ** 2 for x, y in zip(ea, eb))


def test_jl_sign_matrix_is_balanced_and_deterministic():
    s1 = similarity.jl_sign_matrix(8, 64)
    s2 = similarity.jl_sign_matrix(8, 64)
    assert s1 == s2
    flat = [v for row in s1 for v in row]
    assert set(flat) == {1, -1}
    # md5 top bit is unbiased: a grossly unbalanced matrix would mean
    # the hash-derivation broke
    assert 0.35 < flat.count(1) / len(flat) < 0.65
