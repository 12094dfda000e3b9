"""Unit tests for the fourth curation batch: OLS trend moments,
bigram lift, source Jaccard, reciprocal-rank fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heracles_spark.queries.curation4 import (doc_bigram_lift,
                                              doc_source_token_jaccard,
                                              events_value_trend)


def test_ols_trend_matches_closed_form(spark, tmp_path):
    # y = 3x + 7 exactly (in units): slope 3, intercept 7, r = 1
    import pandas as pd

    days = list(range(10))
    rows = pd.DataFrame({
        "event_id": range(10),
        "ts": pd.to_datetime(["2024-01-%02d" % (d + 1) for d in days]),
        "user_id": [1] * 10,
        "event_type": ["lin"] * 10,
        "value": [3.0 * d + 7.0 for d in days],
        "props": ["{}"] * 10,
    })
    p = str(tmp_path / "events.parquet")
    rows.to_parquet(p)
    out = {r["event_type"]: r
           for r in events_value_trend(spark, str(tmp_path)).collect()}
    r = out["lin"]
    assert r["pearson_r"] == pytest.approx(1.0)
    assert r["slope_per_day"] == pytest.approx(3.0)
    # intercept is at epoch day 0, not at the window start: project back
    day0 = r["intercept"]
    import datetime
    d0 = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    assert day0 + 3.0 * d0 == pytest.approx(7.0, abs=1e-3)


def test_ols_trend_constant_x_yields_nulls(spark, tmp_path):
    import pandas as pd

    rows = pd.DataFrame({
        "event_id": range(5),
        "ts": pd.to_datetime(["2024-06-15 0%d:00:00" % h
                              for h in range(5)]),  # same DAY ⇒ denx = 0
        "user_id": [1] * 5,
        "event_type": ["flat"] * 5,
        "value": [float(v) for v in (1, 2, 3, 4, 5)],
        "props": ["{}"] * 5,
    })
    rows.to_parquet(str(tmp_path / "events.parquet"))
    r = events_value_trend(spark, str(tmp_path)).collect()[0]
    assert r["slope_per_day"] is None and r["pearson_r"] is None


def _mini_docs(spark, tmp_path, texts):
    import pandas as pd

    pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["wiki", "web"] * (len(texts) // 2)
                  if len(texts) % 2 == 0 else ["wiki"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bigram_lift_finds_collocation(spark, tmp_path):
    # "foo bar" always adjacent (strong collocation); "baz"/"qux"
    # frequent but never adjacent to each other
    texts = (["foo bar baz qux"] * 30
             + ["baz foo bar qux"] * 30
             + ["qux baz foo bar"] * 30)
    sf = _mini_docs(spark, tmp_path, texts)
    got = doc_bigram_lift(spark, sf).collect()
    top = got[0]
    assert (top["w1"], top["w2"]) == ("foo", "bar")
    assert top["cxy"] == 90
    # lift of a perfect collocation ≈ N²/(Nb·c) > 1_000_000 ppm
    assert top["lift_ppm"] > 1_000_000


def test_source_token_jaccard_brute(spark, tmp_path):
    texts = ["a b c", "b c d"] * 10      # wiki: {a,b,c}; web: {b,c,d}
    sf = _mini_docs(spark, tmp_path, texts)
    rows = doc_source_token_jaccard(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["sa"], r["sb"]) == ("web", "wiki")
    assert r["inter"] == 2 and r["sza"] == 3 and r["szb"] == 3
    assert r["jaccard"] == pytest.approx(2 / 4)


def test_rank_fusion_is_rank_based(spark):
    # with_global_ranks two-pass == naive global window, on rrf input
    from heracles_spark.operators.ranking import with_global_ranks
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(300)],
        "doc_id long, s double")
    two = with_global_ranks(df, ["s", "doc_id"], rn_col="r")
    w = Window.partitionBy(F.lit(0)).orderBy("s", "doc_id")
    naive = df.withColumn("r", F.row_number().over(w))
    assert sorted((r["doc_id"], r["r"]) for r in two.collect()) == \
           sorted((r["doc_id"], r["r"]) for r in naive.collect())
