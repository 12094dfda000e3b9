"""Text analysis operators on controlled strings."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from heracles_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox is in the garden and it is happy"),
        (2, "Der Hund ist nicht in der Schule und das ist gut"),
        (3, "Le chat est dans la maison et il est content avec les autres"),
        (4, "El perro es un animal y la casa es grande con los gatos"),
        (5, "zzz qqq xxx www"),
        (6, "Numbers 12345 67890 11111 22222 33333 !!!???"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark, docs):
    got = {r["doc_id"]: r["n"] for r in
           docs.select("doc_id", text.token_count("text").alias("n")).collect()}
    assert got[1] == 12
    assert got[5] == 4


def test_bpe_ish_token_count(spark, docs):
    got = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", text.bpe_ish_token_count("text").alias("n")).collect()}
    assert got[6] == 12  # 1 word + 5 numbers + 6 punct marks


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"]
           for r in text.with_lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "und"


def test_quality_features(spark, docs):
    feats = {r["doc_id"]: r for r in text.with_quality_features(docs).collect()}
    assert feats[1]["stopword_ratio"] > 0.2     # real English
    assert feats[5]["stopword_ratio"] == 0.0
    assert feats[6]["digit_ratio"] > 0.4
    assert feats[6]["punct_ratio"] > 0.1
    assert feats[1]["digit_ratio"] == 0.0


def test_quality_score_ordering(spark, docs):
    scores = {r["doc_id"]: r["quality_score"]
              for r in text.with_quality_score(docs).collect()}
    assert scores[1] > scores[6]   # prose beats digit noise
    assert scores[1] > scores[5]   # stopword mass counts


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["fingerprint"]
           for r in text.with_fingerprint(df).collect()}
    assert fps[1] == fps[2]        # case + whitespace normalized
    assert fps[1] != fps[3]


def test_md5_fingerprint_matches_hashlib(spark):
    import hashlib

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    got = text.with_md5_fingerprint(df).collect()[0]["fp_md5"]
    assert got == hashlib.md5(b"abc").hexdigest()


def test_hash_split_deterministic(spark):
    from heracles_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(13), "doc_id").collect()}
    assert a == b                          # partition-independent
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.75 < frac < 0.85              # ≈80%


def test_stratified_sample(spark):
    from heracles_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(2000)],
        "doc_id long, lang string")
    s = stratified_sample(df, "lang", {"en": 0.1, "de": 0.5}, seed=42)
    counts = {r["lang"]: r["n"] for r in
              s.groupBy("lang").agg(__import__("pyspark.sql.functions",
                                               fromlist=["count"]).count("*")
                                    .alias("n")).collect()}
    assert 50 < counts["en"] < 200
    assert 350 < counts["de"] < 650


def test_chunk_documents_no_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], "doc_id long, text string")
    chunks = {r["chunk_id"]: (r["chunk_text"], r["n_tokens"])
              for r in text.chunk_documents(df, chunk_tokens=4).collect()}
    assert chunks[0] == ("w0 w1 w2 w3", 4)
    assert chunks[1] == ("w4 w5 w6 w7", 4)
    assert chunks[2] == ("w8 w9", 2)


def test_chunk_documents_overlap(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string")
    chunks = {r["chunk_id"]: r["chunk_text"]
              for r in text.chunk_documents(df, chunk_tokens=4,
                                            stride=2).collect()}
    assert chunks[0] == "a b c d"
    assert chunks[1] == "c d e f"
    assert chunks[2] == "e f"


def test_redact_planted_pii(spark):
    from heracles_spark.operators import text as t

    rows = [(1, "mail bob.smith+x@example.co.uk now"),
            (2, "see https://a.example.com/p?q=1 and http://b.io"),
            (3, "call +1 (415) 555-2671 today"),
            (4, "clean text no pii")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in t.redact_patterns(df).collect()}
    assert out[1]["n_email"] == 1 and "[EMAIL]" in out[1]["redacted"]
    assert "bob.smith" not in out[1]["redacted"]
    assert out[2]["n_url"] == 2 and out[2]["redacted"].count("[URL]") == 2
    assert out[3]["n_phone"] == 1 and "[PHONE]" in out[3]["redacted"]
    assert "555" not in out[3]["redacted"]
    assert out[4]["redacted"] == "clean text no pii"
    assert (out[4]["n_email"], out[4]["n_url"], out[4]["n_phone"]) == (0, 0, 0)


def test_repetition_features(spark):
    from heracles_spark.operators import text as t

    rows = [(1, "spam spam spam spam"),
            (2, "all words here differ fully"),
            (3, "half half one two")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: (r["distinct_ratio"], r["top_word_ratio"])
           for r in t.with_repetition_features(df).collect()}
    assert out[1] == (0.25, 1.0)
    assert out[2] == (1.0, 0.2)
    assert out[3] == (0.75, 0.5)


# -- corpus assembly: mixing, packing, vocabulary ----------------------------

def test_corpus_mix_weight_extremes(spark):
    from heracles_spark.operators.sampling import corpus_mix

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(300)],
        "doc_id long, source string")
    kept = corpus_mix(df, {"a": 0.0, "b": 1.0}).collect()
    srcs = {r.source for r in kept}
    assert "a" not in srcs                       # weight 0 drops all
    assert sum(r.source == "b" for r in kept) == 100   # weight 1 keeps all
    assert sum(r.source == "c" for r in kept) == 100   # unlisted keeps all
    half = corpus_mix(df, {"c": 0.5}).where("source = 'c'").count()
    assert 30 < half < 70                        # ≈50% of 100, hash-exact
    again = corpus_mix(df, {"c": 0.5}).where("source = 'c'").count()
    assert half == again                         # deterministic


def test_pack_sequences_invariants(spark):
    from heracles_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 50) for i in range(200)],
        "doc_id long, n_tokens int")
    p = pack_sequences(df, budget=100, n_shards=4).collect()
    assert all(0 <= r.seq_offset < 100 for r in p)
    assert all(0 <= r.shard < 4 for r in p)
    by_shard: dict[int, list] = {}
    for r in sorted(p, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        # first doc of a shard starts sequence 0 at offset 0
        assert rows[0].seq == 0 and rows[0].seq_offset == 0
        run = 0
        for r in rows:
            # seq/offset are exactly the exclusive cumsum decomposition
            assert r.seq * 100 + r.seq_offset == run
            run += r.n_tokens
        # seq ids never decrease along the stream
        seqs = [r.seq for r in rows]
        assert seqs == sorted(seqs)


def test_term_frequencies_strip_then_lower(spark):
    from heracles_spark.operators.text import term_frequencies

    df = spark.createDataFrame(
        [("The cat, the CAT!", ), ("cat... 42 dogs", ), ("", )],
        "text string")
    got = {r.term: r.n for r in term_frequencies(df).collect()}
    assert got == {"the": 2, "cat": 3, "dogs": 1}
    # min_len drops short residues
    got2 = {r.term: r.n
            for r in term_frequencies(df, min_len=4).collect()}
    assert got2 == {"dogs": 1}


def test_lm_score_hand_computed(spark):
    from heracles_spark.operators.text import lm_score

    # corpus: "a b" x3 and "a c" x1 -> V=3; c1(a)=4; c2(a,b)=3, c2(a,c)=1
    docs = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, r.avg_surprisal)
           for r in lm_score(df).collect()}
    import math
    # doc 1-3: class = floor(log2((4+3)/(3+1))) = floor(log2(1.75)) = 0
    # doc 4:   class = floor(log2((4+3)/(1+1))) = floor(log2(3.5))  = 1
    assert out[1] == (1, 0.0) and out[2] == (1, 0.0) and out[3] == (1, 0.0)
    assert out[4] == (1, 1.0)


def test_lm_score_short_docs_dropped(spark):
    from heracles_spark.operators.text import lm_score

    df = spark.createDataFrame([(1, "only"), (2, "two words")],
                               "doc_id long, text string")
    out = lm_score(df).collect()
    assert [r.doc_id for r in out] == [2]


# -- duplicate n-gram spans -------------------------------------------------

@pytest.fixture(scope="module")
def span_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    rows = [
        # doc 10 and 11 share the 8-gram verbatim (cross-doc dup)
        (10, f"{shared} unique1 unique2 unique3 unique4"),
        (11, f"prefix1 prefix2 {shared} tail1 tail2"),
        # doc 12 repeats its own 8-gram twice (intra-doc dup)
        (12, f"{shared} filler {shared}"),
        # doc 13 has no duplicated 8-gram
        (13, "one two three four five six seven eight nine ten"),
        # doc 14 too short for an 8-gram
        (14, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_cross_and_intra_doc(spark, span_docs):
    got = {r["doc_id"]: r.asDict()
           for r in text.duplicate_ngram_spans(span_docs).collect()}
    assert set(got) == {10, 11, 12}        # 13 clean, 14 too short
    # doc 10: the shared gram starts at pos 0 only -> 1 hit, 1 span, 8 toks
    assert got[10]["n_dup_grams"] == 1
    assert got[10]["n_spans"] == 1
    assert got[10]["dup_tokens"] == 8
    assert got[10]["n_tokens"] == 12
    assert got[10]["dup_fraction"] == pytest.approx(8 / 12, abs=1e-6)
    # doc 11: same gram at pos 2
    assert got[11]["n_dup_grams"] == 1 and got[11]["dup_tokens"] == 8
    # doc 12: gram at pos 0 and pos 9 -> gap 9 > n=8 -> TWO spans
    assert got[12]["n_dup_grams"] == 2
    assert got[12]["n_spans"] == 2
    assert got[12]["dup_tokens"] == 16


def test_duplicate_spans_merge_overlapping(spark):
    # doc 20 == doc 21: every 8-gram duplicates, all hits merge into
    # ONE span covering the whole doc.
    t = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame([(20, t), (21, t)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in text.duplicate_ngram_spans(df).collect()}
    for d in (20, 21):
        assert got[d]["n_dup_grams"] == 13    # 20 - 8 + 1
        assert got[d]["n_spans"] == 1
        assert got[d]["dup_tokens"] == 20
        assert got[d]["dup_fraction"] == 1.0


# -- weighted sampling / per-group cap ---------------------------------------

def test_weighted_sample_matches_manual_priority(spark):
    import hashlib

    from heracles_spark.operators.sampling import weighted_sample

    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [r["doc_id"]
           for r in weighted_sample(df, "w", 25).orderBy("doc_id").collect()]

    def pri(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return float(u) / w

    want = sorted(sorted(rows, key=lambda t: (pri(*t), t[0]))[:25])
    assert got == [i for i, _ in want]


def test_weighted_sample_favors_heavy_rows(spark):
    from heracles_spark.operators.sampling import weighted_sample

    # one row with overwhelming weight is (near-)certain to be kept
    rows = [(i, 1) for i in range(500)] + [(999, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = {r["doc_id"] for r in weighted_sample(df, "w", 10).collect()}
    assert 999 in kept and len(kept) == 10


def test_cap_per_group_two_phase_equals_naive(spark):
    from heracles_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    naive = sorted((r["doc_id"], r["source"])
                   for r in cap_per_group(df, "source", 7).collect())
    salted = sorted((r["doc_id"], r["source"])
                    for r in cap_per_group(df, "source", 7,
                                           n_salt=8).collect())
    assert naive == salted
    per = {}
    for _, g in naive:
        per[g] = per.get(g, 0) + 1
    assert all(v == 7 for v in per.values())


def test_cap_per_group_small_groups_untouched(spark):
    from heracles_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               "doc_id long, source string")
    got = sorted(r["doc_id"]
                 for r in cap_per_group(df, "source", 5).collect())
    assert got == [1, 2, 3]


# -- span corruption --------------------------------------------------------

def test_corrupt_spans_structure(spark):
    import hashlib

    t = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(7, t)], "doc_id long, text string")
    row = text.corrupt_spans(df).collect()[0]

    def trig(doc, pos):
        h = hashlib.md5(f"{doc}:{pos}".encode()).hexdigest()
        return int(h[:8], 16) % 20 == 0

    masked = [any(trig(7, j) for j in range(max(0, i - 2), i + 1))
              for i in range(40)]
    n_runs = sum(1 for i in range(40)
                 if masked[i] and (i == 0 or not masked[i - 1]))
    assert row["n_tokens"] == 40
    assert row["n_masked"] == sum(masked)
    assert row["n_sentinels"] == n_runs
    # rebuild expected corrupted string in python
    out, run = [], 0
    for i in range(40):
        if not masked[i]:
            out.append(f"w{i}")
        elif i == 0 or not masked[i - 1]:
            out.append(f"<extra_id_{run}>")
            run += 1
    assert row["corrupted"] == " ".join(out)


def test_corrupt_spans_no_trigger_is_identity(spark):
    import hashlib

    # find a short doc id/text whose positions never trigger
    for doc in range(1000):
        if not any(int(hashlib.md5(f"{doc}:{p}".encode())
                       .hexdigest()[:8], 16) % 20 == 0 for p in range(5)):
            break
    t = "a b c d e"
    df = spark.createDataFrame([(doc, t)], "doc_id long, text string")
    row = text.corrupt_spans(df).collect()[0]
    assert row["n_masked"] == 0 and row["corrupted"] == t


def test_remove_duplicate_spans_policies(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    rows = [
        (1, f"{shared} unique1 unique2"),
        (2, f"pre1 {shared} post1"),
        (3, "clean doc with no duplicated grams at all here ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    first = {r["doc_id"]: r.asDict() for r in
             text.remove_duplicate_spans(df).collect()}
    # doc 1 is the canonical (lowest-id) holder: untouched
    assert first[1]["n_removed"] == 0
    assert first[1]["cleaned"] == rows[0][1]
    # doc 2 loses the 8 shared tokens, keeps its own
    assert first[2]["n_removed"] == 8
    assert first[2]["cleaned"] == "pre1 post1"
    assert first[3]["n_removed"] == 0

    none = {r["doc_id"]: r.asDict() for r in
            text.remove_duplicate_spans(df, keep="none").collect()}
    assert none[1]["n_removed"] == 8
    assert none[1]["cleaned"] == "unique1 unique2"
    assert none[2]["cleaned"] == "pre1 post1"


def test_build_vocab_and_encode_ids(spark):
    rows = [(1, "a b c a a"), (2, "b c d"), (3, "a zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {r["term"]: (r["id"], r["freq"])
             for r in text.build_vocab(df, size=3).collect()}
    # freq: a=4, b=2, c=2, d=1, zz=1 -> ids a=0, b=1, c=2 (tie b<c)
    assert vocab == {"a": (0, 4), "b": (1, 2), "c": (2, 2)}
    enc = {r["doc_id"]: r for r in
           text.encode_ids(df, text.build_vocab(df, size=3)).collect()}
    assert list(enc[1]["ids"]) == [0, 1, 2, 0, 0]
    assert list(enc[2]["ids"]) == [1, 2, -1] and enc[2]["n_oov"] == 1
    assert list(enc[3]["ids"]) == [0, -1]


def test_cap_per_group_two_phase_property(spark):
    """Hypothesis: salted two-phase cap ≡ naive row_number cap for
    arbitrary group shapes, k, and salt counts."""
    from hypothesis import given, settings, strategies as st

    from heracles_spark.operators.sampling import cap_per_group

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(0, 4), min_size=1, max_size=60),
           st.integers(1, 6), st.integers(1, 9))
    def check(groups, k, n_salt):
        rows = [(i, f"g{g}") for i, g in enumerate(groups)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        naive = sorted((r["doc_id"], r["source"]) for r in
                       cap_per_group(df, "source", k).collect())
        salted = sorted((r["doc_id"], r["source"]) for r in
                        cap_per_group(df, "source", k,
                                      n_salt=n_salt).collect())
        assert naive == salted

    check()


def test_weighted_sample_nonpositive_weights_excluded(spark):
    from heracles_spark.operators.sampling import weighted_sample

    rows = [(1, 10), (2, 0), (3, -5), (4, None), (5, 10)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = {r["doc_id"] for r in weighted_sample(df, "w", 10).collect()}
    assert kept == {1, 5}


def test_importance_scores_ranks_targetlike_docs(spark):
    """DSIR importance scores: a raw doc written in the target
    distribution's vocabulary must outscore a raw doc written in
    off-target vocabulary; target flag and totals behave."""
    from heracles_spark.operators.sampling import importance_scores

    rows = [
        # target distribution: cooking vocabulary
        (1, "salt pepper butter flour salt butter", True),
        (2, "flour sugar butter salt pepper sugar", True),
        # raw pool: one cooking-like, one astronomy doc
        (3, "butter salt flour pepper sugar salt", False),
        (4, "quasar nebula parsec redshift quasar nebula", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    got = {r.doc_id: r for r in
           importance_scores(df, F.col("t")).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[3].n_grams == 6 and got[4].n_grams == 6
    # the cooking-like raw doc scores strictly higher than the
    # astronomy doc (whose grams only ever appear on the source side,
    # so every bucket weight it touches is negative)
    assert got[3].score > got[4].score
    assert got[4].score < 0


def _bpe_reference(word_freqs, n_merges):
    """Pure-Python Sennrich BPE for the golden check."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = \
                    counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        # deterministic tie-break: count DESC, then (a, b) ASC
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        out = {}
        for syms, f in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + f
        words = out
    return merges


def test_bpe_train_matches_reference(spark):
    """Distributed BPE training replays the exact sequential algorithm:
    merge list equals a pure-Python Sennrich implementation with the
    same (count DESC, pair ASC) tie-break."""
    from heracles_spark.operators.text import bpe_segment, bpe_train

    corpus = [(1, "low lower lowest low low"),
              (2, "new newer newest new wide wider"),
              (3, "low new wide widest lowest")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = bpe_train(df, n_merges=8)

    freqs = {}
    for _, t in corpus:
        for w in t.split():
            w = w + "▁"
            freqs[w] = freqs.get(w, 0) + 1
    want = _bpe_reference(freqs, 8)
    assert got == want

    # segmentation round-trip: pieces concatenate back to the words
    seg = bpe_segment(df, got).orderBy("doc_id").collect()
    for row, (_, t) in zip(seg, corpus):
        assert "".join(row.pieces) == "".join(w + "▁" for w in t.split())
        assert row.n_pieces == len(row.pieces)
        assert row.n_words == len(t.split())


def test_dedup_lines_corpus_first_occurrence(spark):
    """C4 line dedup: repeated lines survive only at their global first
    (doc_id, pos); rebuild preserves within-doc order."""
    from heracles_spark.operators.text import dedup_lines_corpus

    rows = [(1, "alpha beta. gamma delta. alpha beta."),
            (2, "gamma delta. unique two."),
            (3, "alpha beta.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_lines_corpus(df).collect()}
    # doc 1 keeps 'alpha beta' (pos 0) and 'gamma delta'; its second
    # 'alpha beta' (pos 2) is a repeat of ITS OWN first occurrence
    assert got[1].n_kept == 2 and got[1].n_dropped == 1
    assert got[1].cleaned == "alpha beta. gamma delta"
    # doc 2's 'gamma delta' lost to doc 1's
    assert got[2].cleaned == "unique two"
    # doc 3 is entirely boilerplate
    assert got[3].n_kept == 0 and got[3].cleaned == ""


def test_with_gopher_rules_flags(spark):
    from heracles_spark.operators.text import with_gopher_rules

    rows = [
        (1, "the cat sat on the mat with a hat and a bat for the rat "
            "plus more filler words to clear the minimum threshold "
            "easily in this test case here now okay"),       # passes
        (2, "short doc"),                                     # word count
        (3, " ".join(["supercalifragilisticexpialidocious"] * 40)),  # mean len
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           with_gopher_rules(df, min_words=20).collect()}
    assert got[1].gopher_pass
    assert not got[2].ok_word_count and not got[2].gopher_pass
    assert not got[3].ok_mean_word_len and not got[3].gopher_pass


def test_temperature_mix_counts(spark):
    """alpha=1 reproduces proportional quotas; alpha=0.5 upweights the
    tail (small group's share strictly rises); quotas never exceed
    group size and are engine-exact integers."""
    from heracles_spark.operators.sampling import temperature_mix_counts

    rows = [("big", i) for i in range(900)] + \
           [("small", i) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    q1 = {r.source: r.quota for r in
          temperature_mix_counts(df, alpha=1.0, total=100,
                                 group_col="source").collect()}
    assert q1 == {"big": 90, "small": 10}
    q5 = {r.source: r.quota for r in
          temperature_mix_counts(df, alpha=0.5, total=100,
                                 group_col="source").collect()}
    assert q5["small"] > 10 and q5["big"] < 90
    assert q5["small"] <= 100


def test_kneser_ney_bigram_lm_exact(spark):
    # corpus: "aa bb aa bb" and "aa bb cc" (min_len=2 keeps all)
    # bigrams: (aa,bb)x3, (bb,aa)x1, (bb,cc)x1
    df = spark.createDataFrame([("aa bb aa bb",), ("aa bb cc",)],
                               "text: string")
    rows = {(r.w1, r.w2): r for r in
            text.kneser_ney_bigram_lm(df, "text").collect()}
    assert set(rows) == {("aa", "bb"), ("bb", "aa"), ("bb", "cc")}
    r = rows[("aa", "bb")]
    assert (r.c12, r.c1, r.fan_out, r.fan_in) == (3, 3, 1, 1)
    # count-of-counts: two singleton types, zero doubles -> D = 1.0
    assert (r.n1, r.n2, r.n_types) == (2, 0, 3)
    d = 2.0 / (2 + 2 * 0)
    # P(bb|aa) = (3-D)/3 + D*1/3 * (1/3)
    assert r.p_kn == pytest.approx(round((3 - d) / 3 + d * 1 / 3 * (1 / 3), 9))
    r = rows[("bb", "cc")]
    assert (r.c12, r.c1, r.fan_out, r.fan_in) == (1, 2, 2, 1)
    # P(cc|bb) = (1-D)/2 + D*2/2 * (1/3)
    assert r.p_kn == pytest.approx(round((1 - d) / 2 + d * 2 / 2 * (1 / 3), 9))
    # probabilities over observed continuations stay in (0, 1]
    assert all(0.0 < v.p_kn <= 1.0 for v in rows.values())


def test_kneser_ney_filters_short_tokens_before_adjacency(spark):
    # 'x' is dropped (min_len=2): adjacency bridges the gap -> (bb,cc)
    df = spark.createDataFrame([("bb x cc",)], "text: string")
    got = {(r.w1, r.w2) for r in
           text.kneser_ney_bigram_lm(df, "text").collect()}
    assert got == {("bb", "cc")}


def test_kneser_ney_no_rare_bigrams_fallback_discount(spark):
    # every bigram type occurs 3x -> n1 = n2 = 0 -> D falls back to 0.5
    df = spark.createDataFrame([("aa bb aa bb aa bb",)] * 1,
                               "text: string").selectExpr(
        "concat(text, ' ', text, ' aa') AS text")
    # sequence: aa bb aa bb aa bb aa bb aa bb aa bb aa ->
    # (aa,bb) x6, (bb,aa) x6
    rows = {(r.w1, r.w2): r for r in
            text.kneser_ney_bigram_lm(df, "text").collect()}
    r = rows[("aa", "bb")]
    assert (r.n1, r.n2) == (0, 0)
    assert r.p_kn == pytest.approx(
        round((6 - 0.5) / 6 + 0.5 * 1 / 6 * (1 / 2), 9))


def test_kneser_ney_trigram_lm_exact(spark):
    # one doc: aa bb cc aa bb cc ->
    # trigrams (aa,bb,cc)x2, (bb,cc,aa), (cc,aa,bb)
    df = spark.createDataFrame([("aa bb cc aa bb cc",)], "text: string")
    rows = {(r.w1, r.w2, r.w3): r for r in
            text.kneser_ney_trigram_lm(df, "text").collect()}
    assert set(rows) == {("aa", "bb", "cc"), ("bb", "cc", "aa"),
                         ("cc", "aa", "bb")}
    r = rows[("aa", "bb", "cc")]
    assert (r.c123, r.c12, r.fan12) == (2, 2, 1)
    assert (r.cnt23, r.c2tot, r.fan2, r.c3, r.n_big) == (1, 1, 1, 1, 3)
    # D3 = n1/(n1+2 n2) = 2/(2+2) = 0.5; all adjusted bigrams are
    # singletons -> D2 = 3/(3+0) = 1.0 -> middle prob = backoff = 1/3
    assert (r.n1_3, r.n2_3, r.n1_2, r.n2_2) == (2, 1, 3, 0)
    p_mid = (1 - 1.0) / 1 + 1.0 * 1 / 1 * (1 / 3)
    assert r.p_kn3 == pytest.approx(
        round((2 - 0.5) / 2 + 0.5 * 1 / 2 * p_mid, 9))
    # two-token docs contribute nothing (no trigram, documented)
    df2 = spark.createDataFrame([("aa bb",)], "text: string")
    assert text.kneser_ney_trigram_lm(df2, "text").count() == 0


def test_kneser_ney_topk_pushdown_identical(spark):
    """Round-13: top_k takes the (count DESC, words) head BEFORE the
    stat joins — must equal limiting the FULL relation under the same
    order, probabilities included (stats derive from the full corpus
    either way), for both LM orders and for k beyond the type count."""
    from heracles_spark.operators import text

    docs = [
        "the cat sat on the mat the cat ran",
        "the dog sat on the log the dog ran away fast",
        "a cat and a dog sat on a mat",
        "the cat sat on the mat again and again",
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    for fn, order in (
            (text.kneser_ney_bigram_lm,
             lambda d: d.orderBy(F.desc("c12"), "w1", "w2")),
            (text.kneser_ney_trigram_lm,
             lambda d: d.orderBy(F.desc("c123"), "w1", "w2", "w3"))):
        for k in (1, 5, 10_000):
            base = [tuple(r) for r in
                    order(fn(df, "text")).limit(k).collect()]
            topk = sorted(
                (tuple(r) for r in fn(df, "text", top_k=k).collect()),
                key=lambda t: base.index(t) if t in base else -1)
            assert sorted(map(repr, base)) == sorted(map(repr, topk)), \
                (fn.__name__, k)
