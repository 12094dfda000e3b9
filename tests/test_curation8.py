"""Unit tests for the eighth curation batch: trade reciprocity and
event-type audience overlap."""

from __future__ import annotations

import pytest

from heracles_spark.queries.curation8 import (events_type_overlap,
                                              nation_trade_reciprocity)


def test_reciprocity_hand_computed(spark, tmp_path):
    import pandas as pd

    # nations: cust 0 buys 3.00 from supp-nation 1; cust 1 buys 1.00
    # back from supp-nation 0 (bidirectional pair); nation 2 only buys
    # (one-way edge 2->0, not reciprocated)
    pd.DataFrame({"l_orderkey": [1, 2, 3], "l_suppkey": [10, 20, 10],
                  "l_extendedprice": [3.0, 1.0, 5.0]}
                 ).to_parquet(str(tmp_path / "lineitem.parquet"))
    pd.DataFrame({"o_orderkey": [1, 2, 3],
                  "o_custkey": [100, 200, 300]}
                 ).to_parquet(str(tmp_path / "orders.parquet"))
    pd.DataFrame({"c_custkey": [100, 200, 300],
                  "c_nationkey": [0, 1, 2]}
                 ).to_parquet(str(tmp_path / "customer.parquet"))
    pd.DataFrame({"s_suppkey": [10, 20],
                  "s_nationkey": [1, 0]}
                 ).to_parquet(str(tmp_path / "supplier.parquet"))
    got = nation_trade_reciprocity(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["nation_a"], r["nation_b"]) == (0, 1)
    assert r["a_buys_from_b_cents"] == 300
    assert r["b_buys_from_a_cents"] == 100
    assert r["imbalance"] == pytest.approx(0.5)     # |300-100|/400
    assert r["n_directed"] == 3 and r["n_bidirectional"] == 2


def test_type_overlap_hand_computed(spark, tmp_path):
    import pandas as pd

    # clickers {1,2,3}, buyers {2,3,4}: inter 2, union 4 → 0.5
    rows = [(i, "2024-01-01 00:0%d:00" % i, u, t, 1.0)
            for i, (u, t) in enumerate(
                [(1, "click"), (2, "click"), (3, "click"),
                 (2, "buy"), (3, "buy"), (4, "buy"),
                 (2, "click")])]             # duplicate user-type row
    pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows]),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": ["{}"] * len(rows),
    }).to_parquet(str(tmp_path / "events.parquet"))
    got = events_type_overlap(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["ta"], r["tb"], r["inter"]) == ("buy", "click", 2)
    assert r["jaccard"] == pytest.approx(0.5)
