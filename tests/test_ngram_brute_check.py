"""Randomized brute-force cross-check of the prefix-filtered
set-similarity join (dedup.ngram_jaccard_pairs): both prefix orders must
reproduce exact python-computed word-gram Jaccard, for every pair, on a
corpus with planted near-dups. Guards the prefix theorem application
(any-global-order losslessness) and the array_intersect verification."""

from __future__ import annotations

import random

import pytest

from heracles_spark.operators import dedup


def _grams(text, n=3):
    toks = text.strip().lower().split()
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _brute(docs, threshold, n=3):
    out = {}
    for i, (ida, ta) in enumerate(docs):
        ga = _grams(ta, n)
        if not ga:
            continue
        for idb, tb in docs[i + 1:]:
            gb = _grams(tb, n)
            if not gb:
                continue
            inter = len(ga & gb)
            jac = inter / (len(ga) + len(gb) - inter)
            if round(jac, 6) >= threshold:
                a, b = sorted((ida, idb))
                out[(a, b)] = round(jac, 6)
    return out


@pytest.mark.parametrize("order", ["hash", "df"])
def test_matches_brute_force(spark, order):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(24):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(20))))
    # planted near-dups: copy with small mutations
    for j, (src, mut) in enumerate([(0, 1), (3, 3), (7, 0)]):
        base = docs[src][1].split()
        for _ in range(mut):
            base[rng.randrange(len(base))] = rng.choice(vocab)
        docs.append((100 + j, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(
               df, threshold=0.3, unit="word", max_doc_freq=1 << 60,
               prefix_order=order).collect()}
    want = _brute(docs, 0.3)
    assert got == want
    assert any(k >= (100, 0) or k[1] >= 100 for k in want)  # dups found


@pytest.mark.parametrize("order", ["hash", "df"])
def test_pair_filter_equals_restricted_full_run(spark, order):
    """pair_filter must equal the FULL-corpus run filtered to
    sample x sample — global df statistics unchanged, only the
    quadratic pair work restricted (the 100 TB recall-audit shape)."""
    from pyspark.sql import functions as F

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(18)))
            for i in range(30)]
    for j, src in enumerate([0, 2, 4, 6, 8]):
        base = docs[src][1].split()
        base[rng.randrange(len(base))] = rng.choice(vocab)
        docs.append((100 + j, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pred = F.col("doc_id") % 2 == 0
    kw = dict(threshold=0.3, unit="word", max_doc_frac=0.2,
              prefix_order=order)
    full = {(r.id_a, r.id_b): r.jaccard
            for r in dedup.ngram_jaccard_pairs(df, **kw).collect()
            if r.id_a % 2 == 0 and r.id_b % 2 == 0}
    sampled = {(r.id_a, r.id_b): r.jaccard
               for r in dedup.ngram_jaccard_pairs(
                   df, pair_filter=pred, **kw).collect()}
    assert sampled == full and full  # non-vacuous
