"""Unit tests for the corpus-curation batch: UniMax water-filling,
CUSUM prefix-sum identity, TV divergence, ngram containment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heracles_spark.operators.sampling import unimax_allocation


@pytest.fixture()
def sources(spark):
    # group a: 10 rows, b: 100, c: 1000 — forces a real water line
    rows = ([("a",)] * 10) + ([("b",)] * 100) + ([("c",)] * 1000)
    return spark.createDataFrame(rows, "source string")


def test_unimax_sums_to_budget_and_respects_caps(spark, sources):
    # total 1110 rows, budget = 2*1110 div 5 = 444, cap = 2 epochs
    out = {r["source"]: r for r in
           unimax_allocation(sources, epochs_cap=2,
                             budget_frac=(2, 5)).collect()}
    assert sum(r["alloc"] for r in out.values()) == 444
    for r in out.values():
        assert 0 <= r["alloc"] <= r["cap"] == 2 * r["sz"]
    # water line walk: a (cap 20) and b (cap 200) both sit below the
    # uniform share of the remaining budget, so both are capped; c
    # absorbs what's left
    assert out["a"]["alloc"] == 20
    assert out["b"]["alloc"] == 200
    assert out["c"]["alloc"] == 224


def test_unimax_budget_exceeds_capacity(spark, sources):
    # budget_frac 5/1 => budget 5550 > total cap 2220: everyone capped
    out = unimax_allocation(sources, epochs_cap=2,
                            budget_frac=(5, 1)).collect()
    assert all(r["alloc"] == r["cap"] for r in out)


def test_unimax_tiny_budget_spreads_remainder(spark, sources):
    # budget = 1110 div 1110 = 1: one group gets 1, others 0,
    # remainder goes to the first group in (cap, name) order
    out = {r["source"]: r["alloc"] for r in
           unimax_allocation(sources, epochs_cap=2,
                             budget_frac=(1, 1110)).collect()}
    assert sorted(out.values()) == [0, 0, 1]
    assert out["a"] == 1  # smallest cap sorts first


def test_cusum_identity_matches_recursion(spark):
    # the window form C_d = S_d - min prefix S must equal the textbook
    # recursion C_d = max(0, C_{d-1} + x_d - mu - slack), scaled by 4n
    xs = [10, 12, 9, 11, 10, 30, 35, 40, 8, 10]
    n, t = len(xs), sum(xs)
    # brute recursion in scaled integers: 4n*(x - mu - mu/4) = 4nx - 5t
    c, brute = 0, []
    for x in xs:
        c = max(0, c + 4 * n * x - 5 * t)
        brute.append(c)
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "d long, x long")
    from pyspark.sql import Window
    wo = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    got = (df.withColumn("p", F.sum("x").over(wo))
             .withColumn("idx", F.row_number().over(Window.orderBy("d")))
             .withColumn("s", 4 * n * F.col("p") - 5 * t * F.col("idx"))
             .withColumn("smin", F.min("s").over(wo))
             .withColumn("cusum", F.col("s") - F.col("smin"))
             .orderBy("d").select("cusum").collect())
    # identity holds only for the ONE-SIDED form when S never needs
    # the max(0, .) clamp mid-stream — which the S - min(S) rewrite
    # provides exactly: min over prefix IS the clamp state
    assert [r["cusum"] for r in got] == brute


def test_tv_divergence_bounds_and_self_distance(spark):
    from heracles_spark.queries.curation import doc_source_divergence
    # identical sources -> tv 0; disjoint vocab -> tv 1
    rows = [(1, "x y z", "en", "s1", 5), (2, "x y z", "en", "s2", 5),
            (3, "p q r", "en", "s3", 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {(r["s1"], r["s2"]): r["tv"]
               for r in doc_source_divergence(spark, d).collect()}
    assert out[("s1", "s2")] == 0.0
    assert out[("s1", "s3")] == 1.0
    assert out[("s2", "s3")] == 1.0


def test_containment_detects_embedded_doc(spark):
    from heracles_spark.queries.curation import doc_ngram_containment
    short = "alpha beta gamma delta epsilon"
    long_ = ("intro words here " + short + " and a very long tail "
             "of unrelated filler content going on and on")
    rows = [(1, short, "en", "s", 5), (2, long_, "en", "s", 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {(r["a"], r["b"]): r["containment"]
               for r in doc_ngram_containment(spark, d).collect()}
    # all of the short doc's 3-grams appear in the long doc
    assert out[(1, 2)] == 1.0
    # but the long doc is NOT contained in the short one (asymmetry);
    # it still clears the 0.1 floor here only if enough grams overlap
    assert out.get((2, 1), 0.0) < 1.0


def test_zipf_bitlength_log2_and_regression(spark):
    from heracles_spark.queries.curation import doc_zipf_slope
    # brute-force the closed form on a tiny corpus with known counts
    words = (["the"] * 50) + (["of"] * 25) + (["a"] * 12) + \
            (["b"] * 6) + (["c"] * 3) + ["d"]
    text = " ".join(words)
    rows = [(1, text, "en", "s", len(text))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    freqs = sorted([50, 25, 12, 6, 3, 1], reverse=True)
    pts = [((r + 1).bit_length() - 1, f.bit_length() - 1)
           for r, f in enumerate(freqs)]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = doc_zipf_slope(spark, d).collect()[0]
    assert got["n_terms"] == 6
    assert got["slope"] == round((n * sxy - sx * sy) / den, 6)
    assert got["intercept"] == round((sy * sxx - sx * sxy) / den, 6)


def test_backlog_sweep_line_matches_brute_force(spark):
    from heracles_spark.queries.curation import orders_open_backlog
    import datetime as dt
    import tempfile, os
    # orders opening/closing across three months, incl. same-day churn
    base = dt.datetime(1995, 1, 1)
    # (orderkey, open_day_offset, last_ship_day_offset)
    spec = [(1, 0, 10), (2, 3, 3), (3, 5, 40), (4, 12, 70),
            (5, 31, 33), (6, 32, 95), (7, 60, 61), (8, 60, 62)]
    orows = [(k, base + dt.timedelta(days=o), "1-URGENT", "O")
             for k, o, _ in spec]
    lrows = []
    for k, o, c in spec:
        # two lineitems; the LATER ship date closes the order
        lrows.append((k, 1, base + dt.timedelta(days=max(o, c - 2))))
        lrows.append((k, 2, base + dt.timedelta(days=c)))
    odf = spark.createDataFrame(
        orows, "o_orderkey long, o_orderdate timestamp,"
               " o_orderpriority string, o_orderstatus string")
    ldf = spark.createDataFrame(
        lrows, "l_orderkey long, l_linenumber int, l_shipdate timestamp")
    # brute force: per month, backlog at month end and intra-month peak
    # (order open on [open, last_ship] inclusive)
    days = range(0, 100)
    daily = {}
    for d in days:
        daily[d] = sum(1 for _, o, c in spec if o <= d <= c)
    month_of = {d: (base + dt.timedelta(days=d)).strftime("%Y-%m")
                for d in days}
    expect = {}
    for d in days:
        m = month_of[d]
        end, peak = expect.get(m, (0, 0))
        expect[m] = (daily[d], max(peak, daily[d]))
    with tempfile.TemporaryDirectory() as td:
        odf.write.parquet(os.path.join(td, "orders.parquet"))
        ldf.write.parquet(os.path.join(td, "lineitem.parquet"))
        got = {r["month"]: (r["month_end_backlog"], r["peak_backlog"])
               for r in orders_open_backlog(spark, td).collect()}
    # the day spine makes every calendar day explicit, so both the
    # month-end value and the intra-month peak are exact — including
    # months whose backlog is pure carry-in with no events
    for m, (end, peak) in expect.items():
        assert got[m] == (end, peak), (m, got.get(m), expect[m])


def test_bloom_prefilter_no_false_negatives_and_fp_under_tiny_m(spark):
    from heracles_spark.operators.dedup import bloom_bits, bloom_prefilter
    hist = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)], "key string")
    # incoming: 10 true dups (k0..k9) + 40 fresh keys
    inc = spark.createDataFrame(
        [(i, f"k{i}") for i in range(10)]
        + [(100 + i, f"new{i}") for i in range(40)],
        "doc_id long, key string")
    # honest m: every true dup flagged, few/no false positives
    bits = bloom_bits(hist, "key", m=1 << 18, k=3)
    flagged = {r["doc_id"] for r in
               bloom_prefilter(inc, bits, "key", m=1 << 18, k=3)
               .collect()}
    assert set(range(10)) <= flagged
    # pathological m=16: the filter saturates — STILL no false
    # negatives (the guarantee), but false positives appear
    bits16 = bloom_bits(hist, "key", m=16, k=3)
    flagged16 = {r["doc_id"] for r in
                 bloom_prefilter(inc, bits16, "key", m=16, k=3)
                 .collect()}
    assert set(range(10)) <= flagged16
    assert len(flagged16) > 10  # collisions flag fresh keys too


def test_bloom_prefilter_preserves_multiplicity_and_payload_types(spark):
    """Round-8 advisor fix: the prefilter must not collapse duplicate
    incoming rows (output multiplicity == input multiplicity) and must
    pass non-groupable payload columns (map) through untouched."""
    from pyspark.sql import functions as F

    from heracles_spark.operators.dedup import bloom_bits, bloom_prefilter

    hist = spark.createDataFrame([("dup",)], "key string")
    inc = spark.createDataFrame(
        [(1, "dup"), (2, "dup"), (2, "dup"), (3, "fresh")],
        "doc_id long, key string").withColumn(
        "meta", F.create_map(F.lit("src"), F.col("key")))
    bits = bloom_bits(hist, "key")
    out = bloom_prefilter(inc, bits, "key").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 2]   # dup kept 2×
    assert all(r["meta"] == {"src": "dup"} for r in out)
    assert [f.name for f in inc.schema.fields] == \
           [f.name for f in bloom_prefilter(inc, bits, "key").schema.fields]


def test_unimax_matches_greedy_reference_on_random_inputs(spark):
    # closed-form water line vs a literal greedy water-filling loop,
    # over several deterministic pseudo-random size profiles
    import hashlib

    def greedy_waterfill(sizes, epochs_cap, budget):
        caps = sorted(((name, sz * epochs_cap) for name, sz in sizes),
                      key=lambda t: (t[1], t[0]))
        alloc, remaining = {}, budget
        pending = list(caps)
        while pending:
            m = len(pending)
            base, rem = divmod(remaining, m)
            name, cap = pending[0]
            if cap <= base:  # below the line: cap it, recompute line
                alloc[name] = cap
                remaining -= cap
                pending.pop(0)
                continue
            # water line found: base each, +1 to the first rem in order
            for j, (nm, _c) in enumerate(pending):
                alloc[nm] = base + (1 if j < rem else 0)
            remaining = 0
            pending = []
        return alloc

    for trial in range(4):
        h = int(hashlib.md5(f"unimax{trial}".encode()).hexdigest(), 16)
        sizes = [(f"s{i}", 1 + (h >> (8 * i)) % 997) for i in range(6)]
        total = sum(sz for _, sz in sizes)
        rows = [(name,) for name, sz in sizes for _ in range(sz)]
        df = spark.createDataFrame(rows, "source string")
        out = {r["source"]: r["alloc"] for r in
               unimax_allocation(df, epochs_cap=2,
                                 budget_frac=(3, 7)).collect()}
        expect = greedy_waterfill(sizes, 2, (total * 3) // 7)
        assert out == expect, (trial, sizes, out, expect)
