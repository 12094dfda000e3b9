"""Unit tests for the sixth curation batch: seasonal-naive backtest
and bipartite-projection supplier similarity."""

from __future__ import annotations

import pytest

from heracles_spark.queries.curation6 import (
    events_seasonal_naive_mae, supplier_shared_part_similarity)


def test_seasonal_naive_mae_hand_computed(spark, tmp_path):
    import pandas as pd

    # daily totals: day d has value d dollars; prediction for day d is
    # day d-7's total, so |err| = 7.00 for every scored day
    rows = []
    for d in range(1, 15):
        rows.append((d, "2024-03-%02d 12:00:00" % d, 1, "buy", float(d)))
    pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows]),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": ["{}"] * len(rows),
    }).to_parquet(str(tmp_path / "events.parquet"))
    r = events_seasonal_naive_mae(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 7
    assert r["mae"] == pytest.approx(7.0)


def test_shared_part_similarity_brute(spark, tmp_path):
    import pandas as pd

    # suppliers: 1 -> parts {10,11,12}; 2 -> {10,11}; 3 -> {99}
    pairs = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 99),
             (1, 10)]  # duplicate lineitem row: distinct first
    pd.DataFrame({
        "l_orderkey": range(len(pairs)),
        "l_suppkey": [p[0] for p in pairs],
        "l_partkey": [p[1] for p in pairs],
    }).to_parquet(str(tmp_path / "lineitem.parquet"))
    got = supplier_shared_part_similarity(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["sa"], r["sb"], r["inter"], r["na"], r["nb"]) == \
        (1, 2, 2, 3, 2)
    assert r["cosine"] == pytest.approx(round(2 / (6 ** 0.5), 6))


def test_burstiness_fano_hand_computed(spark, tmp_path):
    import pandas as pd

    # daily counts: [1, 3] → mean 2, var ((1-2)^2+(3-2)^2)/(2-1) = 2,
    # Fano = 1.0; and a single-day type → NULL (undefined variance)
    rows = ([(i, "2024-03-01 0%d:00:00" % i, 1, "two", 1.0)
             for i in range(1)]
            + [(10 + i, "2024-03-02 0%d:00:00" % i, 1, "two", 1.0)
               for i in range(3)]
            + [(99, "2024-03-01 05:00:00", 1, "one", 1.0)])
    pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows]),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": ["{}"] * len(rows),
    }).to_parquet(str(tmp_path / "events.parquet"))
    from heracles_spark.queries.curation6 import events_burstiness

    got = {r["event_type"]: r
           for r in events_burstiness(spark, str(tmp_path)).collect()}
    assert got["two"]["fano"] == pytest.approx(1.0)
    assert got["two"]["n_days"] == 2 and got["two"]["n_events"] == 4
    assert got["one"]["fano"] is None


def test_split_join_pairs_planted(spark, tmp_path):
    import pandas as pd

    words = ["w%d" % i for i in range(30)]
    whole = " ".join(words)
    part_a = " ".join(words[:20])        # ends with words[10:20]
    part_b = " ".join(words[10:])        # starts with words[10:20]
    other = " ".join("x%d" % i for i in range(15))
    texts = [part_a, part_b, other, whole]
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4], "text": texts, "lang": ["en"] * 4,
        "source": ["web"] * 4, "n_chars": [len(t) for t in texts],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    from heracles_spark.queries.curation6 import doc_split_join_pairs

    r = doc_split_join_pairs(spark, str(tmp_path)).collect()[0]
    assert r["n_eligible"] == 4
    # planted split: doc 1's tail == doc 2's head; nothing else matches
    assert r["n_pairs"] == 1 and r["pair_id_sum"] == 3


def test_png_roundtrip_all_filters_and_gray():
    import numpy as np

    from heracles_spark.operators.media_codecs import (decode_png,
                                                       encode_png)

    rng = np.random.default_rng(42)
    for shape in [(8, 8, 3), (5, 9, 3), (7, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for f in [None, 0, 1, 2, 3, 4]:
            filters = None if f is None else [f] * shape[0]
            out = decode_png(encode_png(px, filters))
            assert out.shape == px.shape and (out == px).all()


def test_png_rejects_corruption_and_exotic_profiles():
    import numpy as np
    import pytest as pt

    from heracles_spark.operators.media_codecs import (decode_png,
                                                       encode_png)

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    raw = bytearray(encode_png(px))
    raw[20] ^= 0xFF                      # flip a byte inside IHDR data
    with pt.raises(ValueError, match="CRC"):
        decode_png(bytes(raw))
    with pt.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a")
