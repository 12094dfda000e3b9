"""Unit tests for the fifth curation batch: Flesch readability and
linear multi-touch attribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heracles_spark.queries.curation5 import (doc_readability,
                                              events_linear_attribution)


def test_readability_hand_computed(spark, tmp_path):
    import pandas as pd

    # "the cat sat. the dog ran!" → 6 words, 2 sentences,
    # syllable groups: e,a,a,e,o,a → 6
    texts = ["the cat sat. the dog ran!"]
    pd.DataFrame({
        "doc_id": [0], "text": texts, "lang": ["en"],
        "source": ["wiki"], "n_chars": [len(texts[0])],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    r = doc_readability(spark, str(tmp_path)).collect()[0]
    assert (r["words"], r["sentences"], r["syllables"]) == (6, 2, 6)
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert r["flesch"] == pytest.approx(round(want, 4))


def test_readability_sentence_clamp(spark, tmp_path):
    import pandas as pd

    pd.DataFrame({
        "doc_id": [0], "text": ["no punctuation here"], "lang": ["en"],
        "source": ["web"], "n_chars": [19],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    r = doc_readability(spark, str(tmp_path)).collect()[0]
    assert r["sentences"] == 1      # clamped, no divide-by-zero


def _mini_events(spark, tmp_path, rows):
    import pandas as pd

    pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows]),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    }).to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_attribution_credit_sums_to_million(spark, tmp_path):
    # user 1: 3 clicks then a purchase → 333333+333333+333334
    # (remainder to the EARLIEST click); user 2's click is outside the
    # 7-day window → unattributed; purchase with no clicks → dropped
    rows = [
        (1, "2024-03-10 01:00:00", 1, "click"),
        (2, "2024-03-10 02:00:00", 1, "click"),
        (3, "2024-03-10 03:00:00", 1, "click"),
        (4, "2024-03-10 04:00:00", 1, "purchase"),
        (5, "2024-01-01 05:00:00", 2, "click"),
        (6, "2024-03-10 05:00:00", 2, "purchase"),
        (7, "2024-03-10 06:00:00", 3, "purchase"),
    ]
    sf = _mini_events(spark, tmp_path, rows)
    got = {r["hour"]: (r["n_touches"], r["credit_ppm"])
           for r in events_linear_attribution(spark, sf).collect()}
    assert got == {1: (1, 333334), 2: (1, 333333), 3: (1, 333333)}
    assert sum(c for _, c in got.values()) == 1_000_000


def test_attribution_single_touch_full_credit(spark, tmp_path):
    rows = [
        (1, "2024-03-09 23:00:00", 7, "click"),
        (2, "2024-03-10 04:00:00", 7, "purchase"),
        (3, "2024-03-11 04:00:00", 7, "purchase"),  # same click credits 2×
    ]
    sf = _mini_events(spark, tmp_path, rows)
    got = events_linear_attribution(spark, sf).collect()
    assert len(got) == 1
    assert got[0]["hour"] == 23
    assert got[0]["n_touches"] == 2          # one click, two purchases
    assert got[0]["credit_ppm"] == 2_000_000


def test_length_emd_hand_computed(spark, tmp_path):
    import pandas as pd

    # wiki: lengths 3,3 (bin=2: bin(4)='100'); web: 7,7 (bin=3)
    texts = ["aaa", "bbbbbbb", "ccc", "ddddddd"]
    pd.DataFrame({
        "doc_id": range(4), "text": texts, "lang": ["en"] * 4,
        "source": ["wiki", "web", "wiki", "web"],
        "n_chars": [len(t) for t in texts],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    from heracles_spark.queries.curation5 import doc_length_emd

    r = doc_length_emd(spark, str(tmp_path)).collect()[0]
    # CDFs diverge by the full mass on exactly one bin boundary:
    # |2*2 - 0*2| = 4 at bin 2, zero elsewhere
    assert (r["sa"], r["sb"]) == ("web", "wiki")
    assert r["emd_scaled"] == 4
    assert r["emd_bins"] == pytest.approx(1.0)


def test_ngram_novelty_hand_computed(spark, tmp_path):
    import pandas as pd

    shared = "a b c d e"                 # one 5-gram, in both sources
    unique = "v w x y z extra"           # two 5-grams, df=1 each
    pd.DataFrame({
        "doc_id": range(3),
        "text": [shared, shared, unique],
        "lang": ["en"] * 3,
        "source": ["wiki", "web", "web"],
        "n_chars": [len(shared), len(shared), len(unique)],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    from heracles_spark.queries.curation5 import doc_ngram_novelty

    got = {r["source"]: r for r in
           doc_ngram_novelty(spark, str(tmp_path)).collect()}
    assert got["wiki"]["n_grams"] == 1 and got["wiki"]["n_novel"] == 0
    assert got["web"]["n_grams"] == 3 and got["web"]["n_novel"] == 2


def test_bottomk_merge_equals_global(spark):
    # bottom-k by hash is mergeable: union of per-split bottom-k,
    # re-ranked, equals the single-pass bottom-k
    import hashlib

    from pyspark.sql.window import Window as W

    rows = [(i, "t%d" % (i % 2)) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    key = F.md5(F.col("event_id").cast("string"))
    w = W.partitionBy("event_type").orderBy(key.asc(), "event_id")

    def bottomk(d, k=10):
        return (d.withColumn("r", F.row_number().over(w))
                 .where(F.col("r") <= k).drop("r"))

    split_union = bottomk(df.where(F.col("event_id") % 3 == 0)).unionByName(
        bottomk(df.where(F.col("event_id") % 3 == 1))).unionByName(
        bottomk(df.where(F.col("event_id") % 3 == 2)))
    merged = sorted(r["event_id"] for r in bottomk(split_union).collect())
    direct = sorted(r["event_id"] for r in bottomk(df).collect())
    assert merged == direct
    want = {t: sorted(range(200),
                      key=lambda i: (hashlib.md5(str(i).encode())
                                     .hexdigest(), i))
            for t in (0, 1)}
    expect = sorted([i for i in want[0] if i % 2 == 0][:10]
                    + [i for i in want[1] if i % 2 == 1][:10])
    assert direct == expect
