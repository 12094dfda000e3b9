"""Query registry: every SURVEY §2 operator expressed as a (spark_fn,
oracle_sql) pair. ``all_queries()``/``all_oracles()`` feed
__spark_entry__.py, tests, and bench.py from one source of truth."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    from heracles_spark.queries import (relational, relational2, relational3,
                                        relational4, pipeline, extensions)

    return (relational.QUERIES, relational2.QUERIES, relational3.QUERIES,
            relational4.QUERIES, pipeline.QUERIES, extensions.QUERIES)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry with per-session plan reuse: each entry is wrapped in
    :func:`heracles_spark.plancache.cached_query`, so re-running a query
    in one session returns the SAME DataFrame (analysis + codegen cache
    hit) — the prepared-plan behavior a long-lived engine session has.
    Direct module access (``relational.QUERIES[...]``) stays uncached
    for tests that want fresh plan construction."""
    from heracles_spark.plancache import cached_query

    out: dict[str, Callable] = {}
    for reg in _registries():
        out.update({k: cached_query(k, v[0]) for k, v in reg.items()})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _registries():
        for k, (_, sql) in reg.items():
            if sql is not None:
                out[k] = sql
    return out
