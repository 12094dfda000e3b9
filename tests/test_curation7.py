"""Unit tests for the seventh curation batch: Fisher scores, 1-NN
confusion, k-anonymity."""

from __future__ import annotations

import pytest


def _mini_embs(spark, tmp_path, rows):
    import pandas as pd

    pd.DataFrame({
        "vec_id": [r[0] for r in rows],
        "embedding": [r[1] for r in rows],
        "label": [r[2] for r in rows],
    }).to_parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_fisher_separable_dim_wins(spark, tmp_path):
    # dim 0 separates the classes (tiny within-class jitter so the
    # score is finite); dim 1 is pure noise; constant dims excluded
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + i * 1e-4, 0.5 * (i % 2)] + [0.0] * 62, 0))
        rows.append((100 + i,
                     [-1.0 - i * 1e-4, 0.5 * ((i + 1) % 2)] + [0.0] * 62,
                     1))
    sf = _mini_embs(spark, tmp_path, rows)
    from heracles_spark.queries.curation7 import embedding_fisher_scores

    got = embedding_fisher_scores(spark, sf).collect()
    assert got[0]["dim"] == 0
    assert got[0]["fisher"] > 1e3      # between >> within
    assert all(r["dim"] in (0, 1) for r in got)   # constants excluded


def test_knn_confusion_identical_twin(spark, tmp_path):
    # each query (id < 200) has an exact twin in the reference set
    # with the same label ⇒ confusion matrix is diagonal
    rows = []
    for i in range(5):
        vec = [float(i)] * 64
        rows.append((i, vec, i % 3))           # query
        rows.append((200 + i, vec, i % 3))     # its twin
        rows.append((300 + i, [float(i) + 50.0] * 64, (i + 1) % 3))
    sf = _mini_embs(spark, tmp_path, rows)
    from heracles_spark.queries.curation7 import embedding_knn_confusion

    got = embedding_knn_confusion(spark, sf).collect()
    assert all(r["true_label"] == r["pred_label"] for r in got)
    assert sum(r["n"] for r in got) == 5


def test_k_anonymity_hand_computed(spark, tmp_path):
    import pandas as pd

    # classes: (0,A)=1 row, (0,B)=3 rows, (1,A)=6 rows
    nk = [0] + [0] * 3 + [1] * 6
    seg = ["A"] + ["B"] * 3 + ["A"] * 6
    pd.DataFrame({
        "c_custkey": range(10),
        "c_name": ["c%d" % i for i in range(10)],
        "c_nationkey": nk,
        "c_acctbal": [0.0] * 10,
        "c_mktsegment": seg,
    }).to_parquet(str(tmp_path / "customer.parquet"))
    from heracles_spark.queries.curation7 import customer_k_anonymity

    got = {r["k"]: (r["classes_below_k"], r["rows_below_k"])
           for r in customer_k_anonymity(spark, str(tmp_path)).collect()}
    assert got[2] == (1, 1)       # only the singleton class
    assert got[5] == (2, 4)       # singleton + the 3-row class
    assert got[10] == (3, 10)     # everything


def test_weighted_median_hand_computed(spark, tmp_path):
    import pandas as pd

    # prices 1,2,3 with weights 1,1,10: cumulative hits half at 3;
    # second group symmetric weights → the LOWER of the two middles
    rows = [("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 10.0),
            ("B", 5.0, 2.0), ("B", 7.0, 2.0)]
    pd.DataFrame({
        "l_returnflag": [r[0] for r in rows],
        "l_extendedprice": [r[1] for r in rows],
        "l_quantity": [r[2] for r in rows],
    }).to_parquet(str(tmp_path / "lineitem.parquet"))
    from heracles_spark.queries.curation7 import lineitem_weighted_median

    got = {r["l_returnflag"]: r["w_median"]
           for r in lineitem_weighted_median(spark,
                                             str(tmp_path)).collect()}
    assert got["A"] == 3.0
    assert got["B"] == 5.0     # 2*cum(5)=4 >= tot(4) → lower middle


def test_distinctive_terms_planted(spark, tmp_path):
    import pandas as pd

    # "zebra" appears 12x only in wiki; "common" everywhere
    wiki = ["zebra common common"] * 12
    web = ["common common common"] * 12
    texts = wiki + web
    pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["wiki"] * 12 + ["web"] * 12,
        "n_chars": [len(t) for t in texts],
    }).to_parquet(str(tmp_path / "documents.parquet"))
    from heracles_spark.queries.curation7 import doc_distinctive_terms

    got = doc_distinctive_terms(spark, str(tmp_path)).collect()
    wiki_top = [r for r in got if r["source"] == "wiki"][0]
    assert wiki_top["w"] == "zebra" and wiki_top["cs"] == 12
    # exclusive term: ratio = 12*(36+1)*1e6 // (0+1)*36
    assert wiki_top["ratio_ppm"] == 12 * 37 * 1_000_000 // 36


def test_gif_roundtrip_and_lzw_reset():
    import numpy as np

    from heracles_spark.operators.media_codecs import (decode_gif,
                                                       encode_gif)

    rng = np.random.default_rng(11)
    # large enough to force dictionary growth past several width
    # steps AND a mid-stream clear-code reset (>4094 codes)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (80, 80), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, pal))
    assert out.shape == (80, 80, 3)
    assert (out == pal[idx]).all()


def test_gif_rejects_garbage():
    import pytest as pt

    from heracles_spark.operators.media_codecs import decode_gif

    with pt.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG????")
