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


def test_grid_epsilon_join_equals_bruteforce(spark):
    import itertools

    from heracles_spark.operators.spatial import grid_epsilon_join

    pts = [(i, ((i * 37) % 100 - 50) * 1000, ((i * 61) % 90 - 45) * 1000)
           for i in range(120)]
    df = spark.createDataFrame(pts, "id long, xm long, ym long")
    eps = 9000
    got = sorted((r["a"], r["b"], r["dist2"])
                 for r in grid_epsilon_join(df, eps=eps).collect())
    want = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= eps * eps)
    assert got == want
    # negative coordinates straddling cell 0 are the classic floor
    # division bug — make sure some pairs cross the origin cell
    assert any(a[1] < 0 < b[1] or b[1] < 0 < a[1]
               for a, b in itertools.combinations(pts, 2))


def test_dbscan_two_blobs_and_noise(spark):
    from heracles_spark.operators.spatial import dbscan_2d

    blob1 = [(i, 0 + i * 10, 0 + i * 10) for i in range(5)]        # tight
    blob2 = [(10 + i, 100000 + i * 10, 100000) for i in range(5)]  # tight
    lone = [(99, 50000, -50000)]                                    # noise
    df = spark.createDataFrame(blob1 + blob2 + lone,
                               "id long, xm long, ym long")
    got = {r["id"]: (r["cluster"], r["is_core"])
           for r in dbscan_2d(df, eps=1000, min_pts=4).collect()}
    assert all(got[i] == (0, True) for i in range(5))
    assert all(got[10 + i] == (10, True) for i in range(5))
    assert got[99] == (-1, False)


def test_dbscan_border_takes_min_core_label(spark):
    from heracles_spark.operators.spatial import dbscan_2d

    # 4 mutually-within-eps core points; a border point within eps of
    # only ONE knot end, so its own neighborhood is too small for core
    knot = [(0, 0, 0), (1, 333, 0), (2, 667, 0), (3, 1000, 0)]
    border = [(50, 1900, 0)]
    df = spark.createDataFrame(knot + border, "id long, xm long, ym long")
    got = {r["id"]: (r["cluster"], r["is_core"])
           for r in dbscan_2d(df, eps=1000, min_pts=4).collect()}
    assert all(got[i] == (0, True) for i in range(4))
    assert got[50] == (0, False)     # attached, not core
