"""Plan cache (heracles_spark.plancache): per-session reuse of table
reads and query-builder DataFrames — the prepared-statement analogue."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

from heracles_spark import plancache


@pytest.fixture(autouse=True)
def _fresh_cache():
    plancache.clear()
    yield
    plancache.clear()


def test_table_memoized_per_path(spark):
    a = plancache.table(spark, f"{SF_SMALL}/region.parquet")
    b = plancache.table(spark, f"{SF_SMALL}/region.parquet")
    c = plancache.table(spark, f"{SF_SMALL}/nation.parquet")
    assert a is b
    assert a is not c
    assert a.count() == 5


def test_disabled_by_env(spark, monkeypatch):
    monkeypatch.setenv("HERACLES_PLAN_CACHE", "0")
    a = plancache.table(spark, f"{SF_SMALL}/region.parquet")
    b = plancache.table(spark, f"{SF_SMALL}/region.parquet")
    assert a is not b


def test_cached_query_reuses_dataframe(spark):
    calls = []

    def build(s, sf):
        calls.append(sf)
        return plancache.table(s, f"{sf}/region.parquet")

    q = plancache.cached_query("t_region", build)
    a = q(spark, SF_SMALL)
    b = q(spark, SF_SMALL)
    assert a is b and calls == [SF_SMALL]
    # distinct sf_dir -> distinct plan
    q(spark, SF_SMALL + "/")
    assert len(calls) == 2


def test_registry_entries_cached_and_correct(spark):
    from heracles_spark.queries import all_queries

    qs = all_queries()
    df1 = qs["q6_forecast_revenue"](spark, SF_SMALL)
    df2 = qs["q6_forecast_revenue"](spark, SF_SMALL)
    assert df1 is df2
    r1 = df1.collect()
    r2 = df2.collect()  # re-collect executes again, same result
    assert r1 == r2 and len(r1) == 1


def test_eviction_bounded(spark):
    for i in range(plancache._MAX_ENTRIES + 10):
        plancache._put(("k", i), object())
    assert len(plancache._CACHE) <= plancache._MAX_ENTRIES
