"""Session-scoped plan/DataFrame caches — the prepared-statement analogue.

The reference engine keeps long-lived table handles and reuses compiled
query plans across executions (its CLI holds one connection for a whole
session). In PySpark the corresponding cost is *driver-side plan
construction*: every ``spark.read.parquet`` lists files + reads the
footer schema, and every Column-by-Column builder pays py4j round-trips;
re-analyzing the same logical plan also re-mints expression IDs, which
defeats the whole-stage-codegen cache for lambda-bearing plans.

DataFrames are immutable lazy plans — reusing one is always semantically
safe within a live session (``collect()`` re-executes from the source
files each time; nothing is pinned in memory unless an operator
explicitly ``persist()``s). So:

- :func:`table` memoizes ``spark.read.parquet(path)`` per (session, path).
- :func:`cached_query` memoizes a *query builder's* result DataFrame per
  (session, query name, sf_dir) — the registry in
  ``heracles_spark.queries`` wraps every entry with it, so repeated runs
  of the same query in one session (a REPL user re-issuing a statement,
  the bench harness timing a warm run) skip plan construction and hit
  Spark's codegen cache, exactly like an engine's prepared-plan cache.

Keys use ``sparkContext.applicationId`` (unique per SparkSession
lifetime), so a stopped-and-recreated session never sees stale plans.
Disable wholesale with HERACLES_PLAN_CACHE=0. Bounded FIFO eviction
keeps the cache from growing without limit across many sessions.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from collections.abc import Callable
from functools import wraps

from pyspark.sql import DataFrame, SparkSession

_MAX_ENTRIES = 1024
_CACHE: OrderedDict[tuple, DataFrame] = OrderedDict()


def enabled() -> bool:
    return os.environ.get("HERACLES_PLAN_CACHE", "1") != "0"


def _app_id(spark: SparkSession) -> str:
    # applicationId is a py4j call; stash it on the session object so the
    # cache key costs a plain attribute read after the first lookup.
    app = getattr(spark, "_heracles_app_id", None)
    if app is None:
        app = spark.sparkContext.applicationId
        spark._heracles_app_id = app
    return app


def _put(key: tuple, df: DataFrame) -> None:
    _CACHE[key] = df
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)


def clear() -> None:
    _CACHE.clear()


def table(spark: SparkSession, path: str) -> DataFrame:
    """Memoized ``spark.read.parquet(path)`` (file listing + footer
    schema read happen once per session per path). Reads go through
    :func:`heracles_spark.layout.resolve`, so a prepared bulk-load
    mirror (HERACLES_LAYOUT_DIR) transparently replaces the raw file —
    same rows, scan-parallel chunking."""
    from heracles_spark import layout

    path = layout.resolve(path)
    if not enabled():
        return spark.read.parquet(path)
    key = (_app_id(spark), "table", path)
    df = _CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _put(key, df)
    return df


def memo(spark: SparkSession, key_parts: tuple,
         build: Callable[[], DataFrame]) -> DataFrame:
    """Generic session-scoped memoization for derived DataFrames (e.g.
    the dtype-normalized events relation)."""
    if not enabled():
        return build()
    key = (_app_id(spark),) + key_parts
    df = _CACHE.get(key)
    if df is None:
        df = build()
        _put(key, df)
    return df


def cached_query(name: str, fn: Callable) -> Callable:
    """Wrap a registry query builder ``fn(spark, sf_dir) -> DataFrame``
    with per-session plan reuse."""

    @wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        if not enabled():
            return fn(spark, sf_dir)
        key = (_app_id(spark), "query", name, sf_dir)
        df = _CACHE.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _put(key, df)
        return df

    run.__wrapped_query__ = fn
    return run
