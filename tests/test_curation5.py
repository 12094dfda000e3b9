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
